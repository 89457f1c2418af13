"""Backend adapters for model-based metrics.

These metrics score with pretrained models (ONNX DNSMOS, NISQA, UTMOS,
SCOREQ, mHuBERT, wav2vec2-phoneme, RawNet3, emotion2vec, OWSM) that the
reference pulls from espnet / torch.hub / HF hubs.  This build is
environment-agnostic: each loader tries its stack (local HF cache first,
then hub download when the machine has egress) and raises a single clear
``BackendUnavailable`` otherwise, which the CLIs surface with download
instructions.  The scoring math around the models (cosine similarities,
Levenshtein accounting, accuracy) is implemented natively here.
"""

from __future__ import annotations

import numpy as np


class BackendUnavailable(RuntimeError):
    def __init__(self, name: str, hint: str):
        super().__init__(
            f"backend for {name} is unavailable in this environment. {hint}"
        )


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def load_dnsmos(primary_model: str, p808_model: str, device: str = "cpu"):
    """DNSMOS ONNX runner (reference: espnet DNSMOS_local over onnxruntime).

    Prefers onnxruntime when installed; otherwise runs the graphs natively
    on jnp via ops/onnx_jax.py (jitted — on TPU when one is attached), so
    DNSMOS needs only the two .onnx weight files."""
    from pathlib import Path

    if not (Path(primary_model).exists() and Path(p808_model).exists()):
        raise BackendUnavailable(
            "DNSMOS",
            f"model files not found: {primary_model}, {p808_model} — download "
            "sig_bak_ovr.onnx / model_v8.onnx from "
            "https://github.com/microsoft/DNS-Challenge (DNSMOS dir).",
        )
    try:
        import onnxruntime as ort

        providers = ["CPUExecutionProvider"]
        return (
            ort.InferenceSession(primary_model, providers=providers),
            ort.InferenceSession(p808_model, providers=providers),
        )
    except ImportError:
        pass
    if device == "cpu":
        # must precede the first jax backend use — a sitecustomize may pin
        # JAX_PLATFORMS to a remote TPU plugin (see CLAUDE.md)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            # backend already initialized by the host process — scoring will
            # run on whatever platform that is, not the requested cpu
            print(
                "WARNING: jax backend already initialized; --device cpu ignored "
                f"(DNSMOS will score on the {jax.default_backend()} backend)",
                flush=True,
            )
    from urgent2026_challenge_track1_tpu.ops import onnx_jax

    try:
        return (
            onnx_jax.InferenceSession(primary_model),
            onnx_jax.InferenceSession(p808_model),
        )
    except NotImplementedError as e:
        raise BackendUnavailable(
            "DNSMOS",
            f"native ONNX executor lacks an op used by these models ({e}); "
            "install onnxruntime or extend ops/onnx_jax.py.",
        ) from e


def load_hf_model(model_id: str, cls_name: str, metric: str):
    """transformers AutoModel/AutoProcessor pair (needs local cache or egress)."""
    try:
        import transformers
    except ImportError as e:
        raise BackendUnavailable(metric, "transformers is not installed") from e
    try:
        cls = getattr(transformers, cls_name)
        model = cls.from_pretrained(model_id)
        proc = transformers.AutoProcessor.from_pretrained(model_id)
        return model, proc
    except Exception as e:
        raise BackendUnavailable(
            metric,
            f"could not load '{model_id}' — no local HF cache and/or no "
            f"network egress ({type(e).__name__}).",
        ) from e


def load_torchscript(path: str, device: str = "cpu"):
    """Offline TorchScript deployment route shared by the model-based CLIs:
    ``--model_path`` points at a ``torch.jit`` export of the scoring model
    (made once on a machine with egress via ``torch.jit.script``/``trace``).
    An explicitly configured local export that fails to load is a USER error,
    never a skipped backend — eval_all.sh must not silently drop the metric."""
    import torch

    try:
        return torch.jit.load(path, map_location=device)
    except Exception as e:
        raise SystemExit(
            f"ERROR: could not torch.jit.load('{path}') "
            f"({type(e).__name__}: {e})"
        ) from e


def load_torch_hub(repo: str, entry: str, metric: str, **kwargs):
    try:
        import torch
    except ImportError as e:
        raise BackendUnavailable(metric, "torch is not installed") from e
    try:
        return torch.hub.load(repo, entry, trust_repo=True, **kwargs)
    except Exception as e:
        raise BackendUnavailable(
            metric,
            f"torch.hub.load('{repo}', '{entry}') failed — needs network "
            f"egress or a pre-populated hub cache ({type(e).__name__}).",
        ) from e


class ScriptedSpeech2Text:
    """Offline ASR route for the OWSM-backed CLIs (WER/CER, LID): wraps a
    TorchScript export in the espnet ``Speech2Text`` call surface those CLIs
    drive (reference calculate_wer.py / calculate_lid_accuracy.py use
    espnet's hub models; an air-gapped deployment points ``--model_path`` at
    any scripted ASR honoring this contract instead).

    Contract of the export: ``forward(wave_T: float32 Tensor, lang_sym: str,
    task_sym: str) -> str`` — the transcript of one <=30 s window (may carry
    ``<12.34>``-style timestamps for long-form decoding; for LID the first
    whitespace token must be the language tag, e.g. ``<eng>``).

    ``beam_search.beam_size`` / ``maxlenratio`` assignments are accepted and
    ignored — a scripted export has its search baked in.
    """

    def __init__(self, module, device: str = "cpu"):
        import types

        self._m = module.to(device).eval()
        self._device = device
        self.beam_search = types.SimpleNamespace(beam_size=None)
        self.maxlenratio = None

    def __call__(self, speech, prev=None, lang_sym="<nolang>", task_sym="<asr>"):
        import torch

        x = torch.from_numpy(np.ascontiguousarray(speech, np.float32))
        with torch.no_grad():
            text = str(self._m(x.to(self._device), lang_sym, task_sym))
        # espnet-shaped n-best entry: text at [-2], tokens at [1]
        return [(text, text.split() or [""], text, None)]


def load_espnet_model(tag: str, metric: str, **kwargs):
    try:
        import espnet2  # noqa: F401
    except ImportError as e:
        raise BackendUnavailable(
            metric, f"espnet is not installed (model tag: {tag})"
        ) from e
    from espnet2.bin.s2t_inference import Speech2Text

    return Speech2Text.from_pretrained(model_tag=tag, **kwargs)
