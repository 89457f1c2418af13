"""URGENT 2026 Challenge Track 1 — TPU-native framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``urgent-challenge/urgent2026_challenge_track1`` (universal speech enhancement
across 7 sampling rates, 8-48 kHz): models (BSRNN discriminative + flow-matching
generative), data simulation (offline + online dynamic mixing), training,
inference and evaluation — designed TPU-first (SPMD over device meshes,
functional transforms, static shapes, scan recurrences, Pallas kernels).

Layer map mirrors the reference (see SURVEY.md §1):
  L5 CLI            train_se.py / inference.py (repo root)
  L4 training       urgent2026_challenge_track1_tpu.train
  L3 models         urgent2026_challenge_track1_tpu.models / .sampling
  L2 data pipeline  urgent2026_challenge_track1_tpu.data
  L1 simulation     urgent2026_challenge_track1_tpu.simulation
  eval              urgent2026_challenge_track1_tpu.metrics
"""

__version__ = "0.1.0"
