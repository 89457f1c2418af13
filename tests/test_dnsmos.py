"""DNSMOS CLI: featurization shapes + both-model wiring via stub ONNX
sessions (no weights in the image; reference espnet DNSMOS_local consumes
model_v8.onnx on 120-band log-mel of the 9.01 s window minus 160 samples)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "calc_dnsmos", Path(__file__).parent.parent / "evaluation_metrics" / "calculate_nonintrusive_dnsmos.py"
)
sys.path.insert(0, str(Path(__file__).parent.parent / "evaluation_metrics"))
dnsmos = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dnsmos)


class _StubSession:
    def __init__(self, out):
        self.out = out
        self.inputs = []

    def run(self, _, feed):
        (arr,) = feed.values()
        self.inputs.append(np.asarray(arr))
        return [np.asarray(self.out, np.float32)]


def test_score_one_shapes_and_wiring():
    fs = 16000
    rng = np.random.default_rng(0)
    audio = 0.1 * rng.standard_normal(int(11.5 * fs))
    primary = _StubSession([[3.0, 3.5, 2.8]])
    p808 = _StubSession([[3.7]])
    scores = dnsmos.score_one((primary, p808), audio, fs)
    assert set(scores) == {"DNSMOS_OVRL", "P808_MOS"}
    assert abs(scores["P808_MOS"] - 3.7) < 1e-6
    # primary consumes the raw 9.01 s waveform
    assert primary.inputs[0].shape == (1, int(16000 * 9.01))
    # p808 consumes librosa-compatible log-mel of window[:-160]: 900 frames
    assert p808.inputs[0].shape == (1, 900, 120)
    assert p808.inputs[0].dtype == np.float32
    # both models ran once per 1 s hop
    assert len(primary.inputs) == len(p808.inputs) == 2


def test_logmel_matches_librosa_conventions():
    """power_to_db(ref=max): max value maps to (0 + 40)/40 = 1; floor -80 dB
    maps to -1; Slaney filterbank rows are area-normalised."""
    fs = 16000
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * 440 * t)
    f = dnsmos.logmel_features(x)
    assert f.max() == np.float32(1.0)
    assert f.min() >= -1.0
    mel = dnsmos._slaney_mel_matrix()
    peak_rows = mel.max(axis=1)
    # with n_fft=321 / 120 mels some low filters are empty — librosa's exact
    # behavior for these espnet parameters (it warns "Empty filters detected")
    assert (peak_rows[1:] > 0).mean() > 0.9
    # area norm: wider (higher) bands have lower peaks
    assert peak_rows[-1] < peak_rows[1:20].max()


def test_cli_main_with_stub_sessions(tmp_path):
    import argparse

    fs = 16000
    from urgent2026_challenge_track1_tpu.utils import audio_io

    wav = tmp_path / "a.wav"
    audio_io.write(str(wav), 0.05 * np.random.default_rng(1).standard_normal(fs * 2), fs)
    scp = tmp_path / "inf.scp"
    scp.write_text(f"u0 {wav}\n")
    args = argparse.Namespace(
        inf_scp=str(scp), output_dir=str(tmp_path / "out"), nsplits=1, job=1,
        device="cpu", primary_model="x", p808_model="y",
    )
    sessions = (_StubSession([[3.0, 3.5, 2.8]]), _StubSession([[3.3]]))
    dnsmos.main(args, sessions=sessions)
    lines = (tmp_path / "out" / "DNSMOS_OVRL.scp").read_text().strip().split("\n")
    assert lines[0].startswith("u0 ")
    assert (tmp_path / "out" / "P808_MOS.scp").exists()
    results = (tmp_path / "out" / "RESULTS.txt").read_text()
    assert "DNSMOS_OVRL" in results and "P808_MOS" in results


def test_load_dnsmos_native_executor_end_to_end(tmp_path):
    """No onnxruntime in this image: load_dnsmos falls back to the jnp
    executor (ops/onnx_jax.py).  DNSMOS-shaped graphs written with the
    in-repo ONNX writer are scored through the real score_one pipeline."""
    from urgent2026_challenge_track1_tpu.utils import onnx_lite
    import _backends

    rng = np.random.default_rng(2)

    def save(path, nodes, inits, inputs, outputs, shapes):
        g = onnx_lite.Graph(
            nodes=[onnx_lite.Node(*n) for n in nodes],
            initializers=inits, inputs=list(inputs), outputs=list(outputs),
            input_shapes=shapes,
        )
        path.write_bytes(onnx_lite.dumps(onnx_lite.Model(graph=g)))

    # primary: (1, 144160) raw audio -> mean -> affine -> (1, 3)
    w1 = rng.standard_normal((3, 1)).astype(np.float32)
    b1 = np.array([3.0, 3.4, 2.9], np.float32)
    save(
        tmp_path / "sig_bak_ovr.onnx",
        [("ReduceMean", ["input_1"], ["m"], {"axes": [1], "keepdims": 1}),
         ("Gemm", ["m", "w1", "b1"], ["out"], {"transB": 1})],
        {"w1": w1, "b1": b1}, ["input_1"], ["out"], {"input_1": (1, 144160)},
    )
    # p808: (1, 900, 120) log-mel -> flatten-mean -> affine -> (1, 1)
    w2 = rng.standard_normal((1, 1)).astype(np.float32)
    b2 = np.array([3.6], np.float32)
    save(
        tmp_path / "model_v8.onnx",
        [("ReduceMean", ["input_1"], ["m"], {"axes": [1, 2], "keepdims": 0}),
         ("Unsqueeze", ["m"], ["mu"], {"axes": [0]}),
         ("Gemm", ["mu", "w2", "b2"], ["out"], {"transB": 1})],
        {"w2": w2, "b2": b2}, ["input_1"], ["out"], {"input_1": (1, 900, 120)},
    )

    sessions = _backends.load_dnsmos(
        str(tmp_path / "sig_bak_ovr.onnx"), str(tmp_path / "model_v8.onnx")
    )
    fs = 16000
    audio = 0.05 * rng.standard_normal(int(10 * fs))
    scores = dnsmos.score_one(sessions, audio, fs)
    assert set(scores) == {"DNSMOS_OVRL", "P808_MOS"}
    assert np.isfinite(scores["DNSMOS_OVRL"]) and np.isfinite(scores["P808_MOS"])
    assert 1.0 < scores["P808_MOS"] < 5.0


def test_score_one_empty_audio_returns_nan():
    """Zero-sample audio must not hang the tile-up loop (job-array workers
    would spin forever); NaN is excluded by the nanmean aggregation."""
    scores = dnsmos.score_one((_StubSession([[3.0, 3.5, 2.8]]), _StubSession([[3.3]])),
                              np.zeros(0), 16000)
    assert np.isnan(scores["DNSMOS_OVRL"]) and np.isnan(scores["P808_MOS"])
