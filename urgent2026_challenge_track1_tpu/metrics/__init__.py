"""Evaluation metrics: intrusive DSP metrics + host adapters for model-based
MOS/ASR metrics (driven by the CLIs in evaluation_metrics/)."""
