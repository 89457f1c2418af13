"""End-to-end eval_all.sh orchestration (VERDICT r2 item 5).

On a weights-less image one invocation must produce the intrusive metrics,
DNSMOS (via stub .onnx graphs run by the native jnp executor), and the
grouped breakdown, list the other nine model-based metrics as skipped
(exit code 86 from the CLIs), and exit 0. Reference surface:
/root/reference/evaluation_metrics/eval_all.sh:21-37 (which assumes all
backends installed and aborts otherwise).
"""

import os
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent

SKIPPED_NINE = [
    "nisqa", "utmos", "scoreq", "speechbert_score", "phoneme_similarity",
    "speaker_similarity", "emotion_similarity", "lid_accuracy", "wer",
]


def _stub_dnsmos_models(tmp: Path):
    """Tiny valid .onnx graphs with DNSMOS I/O signatures: primary consumes
    the raw (1, 144160) window -> (1, 3) [sig, bak, ovr]; p808 consumes
    (1, 900, 120) log-mel -> (1, 1)."""
    from urgent2026_challenge_track1_tpu.utils import onnx_lite

    def build(nodes, inits, inputs, outputs, shapes):
        g = onnx_lite.Graph(
            nodes=[onnx_lite.Node(*n) for n in nodes],
            initializers=inits,
            inputs=list(inputs),
            outputs=list(outputs),
            input_shapes=shapes,
        )
        return onnx_lite.dumps(onnx_lite.Model(graph=g))

    w3 = np.array([[3.2], [3.4], [2.9]], np.float32)  # (3,1) transB
    primary = build(
        [
            ("ReduceMean", ["input_1"], ["m"], {"axes": [1], "keepdims": 1}),
            ("Gemm", ["m", "w"], ["y"], {"transB": 1}),
        ],
        {"w": w3},
        ["input_1"], ["y"], {"input_1": (1, 144160)},
    )
    p808 = build(
        [
            ("ReduceMean", ["input_1"], ["m"], {"axes": [1, 2], "keepdims": 1}),
            ("Flatten", ["m"], ["f"], {}),
            ("Gemm", ["f", "w", "b"], ["y"], {"transB": 1}),
        ],
        {"w": np.zeros((1, 1), np.float32), "b": np.array([3.7], np.float32)},
        ["input_1"], ["y"], {"input_1": (1, 900, 120)},
    )
    (tmp / "sig_bak_ovr.onnx").write_bytes(primary)
    (tmp / "model_v8.onnx").write_bytes(p808)
    return tmp / "sig_bak_ovr.onnx", tmp / "model_v8.onnx"


def test_eval_all_graceful_degradation(tmp_path):
    from urgent2026_challenge_track1_tpu.utils import audio_io

    fs = 16000
    rng = np.random.default_rng(0)
    inf_lines, ref_lines, lang_lines, text_lines = [], [], [], []
    meta_rows = [
        "id\tfs\tsnr_dB\tlength\tspeech_sid\trir_uid\taugmentation",
    ]
    for i in range(3):
        clean = 0.1 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(2 * fs) / fs)
        noisy = clean + 0.01 * rng.standard_normal(2 * fs)
        ref = tmp_path / f"ref{i}.wav"
        inf = tmp_path / f"inf{i}.wav"
        audio_io.write(str(ref), clean.astype(np.float32), fs)
        audio_io.write(str(inf), noisy.astype(np.float32), fs)
        inf_lines.append(f"u{i} {inf}")
        ref_lines.append(f"u{i} {ref}")
        lang_lines.append(f"u{i} eng")
        text_lines.append(f"u{i} some words here")
        meta_rows.append(
            f"u{i}\t{fs}\t{5 * i}\t{2 * fs}\tlibrispeech_{i}\t"
            f"{'none' if i % 2 else 'rir_1'}\t"
            f"{'none' if i == 0 else 'clipping(min=0.1,max=0.9)'}"
        )
    (tmp_path / "inf.scp").write_text("\n".join(inf_lines) + "\n")
    (tmp_path / "ref.scp").write_text("\n".join(ref_lines) + "\n")
    (tmp_path / "utt2lang").write_text("\n".join(lang_lines) + "\n")
    (tmp_path / "text").write_text("\n".join(text_lines) + "\n")
    (tmp_path / "meta.tsv").write_text("\n".join(meta_rows) + "\n")
    primary, p808 = _stub_dnsmos_models(tmp_path)

    out = tmp_path / "out"
    env = {
        # deliberate CLAUDE.md deviation: /root/.axon_site is EXCLUDED from
        # PYTHONPATH so the child CLIs run on genuine CPU (no TPU tunnel)
        "PATH": f"{os.path.dirname(os.sys.executable)}:/usr/bin:/bin",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
        "HOME": os.environ.get("HOME", "/root"),
        "inf_scp": str(tmp_path / "inf.scp"),
        "ref_scp": str(tmp_path / "ref.scp"),
        "output_dir": str(out),
        "utt2lang": str(tmp_path / "utt2lang"),
        "text": str(tmp_path / "text"),
        "meta_tsv": str(tmp_path / "meta.tsv"),
        "nj": "2",
        "device": "cpu",
        "dnsmos_args": f"--primary_model {primary} --p808_model {p808}",
    }
    r = subprocess.run(
        ["bash", str(REPO / "eval_all.sh")],
        capture_output=True, text=True, cwd=str(REPO), env=env, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])

    # summary lists produced vs skipped
    assert "produced (3): intrusive_se dnsmos breakdown" in r.stdout, r.stdout[-2000:]
    for name in SKIPPED_NINE:
        assert name in r.stdout.split("skipped", 1)[1], name

    # artifacts on disk
    se_results = (out / "score" / "se" / "RESULTS.txt").read_text()
    assert "PESQ" in se_results and "ESTOI" in se_results
    dns_results = (out / "score" / "dnsmos" / "RESULTS.txt").read_text()
    assert "DNSMOS_OVRL" in dns_results and "P808_MOS" in dns_results
    breakdowns = list((out / "score").rglob("*.breakdown.txt"))
    assert breakdowns, "get_breakdown output missing"
    assert "Group by fs" in breakdowns[0].read_text()


def test_eval_all_breakdown_failure_does_not_abort(tmp_path):
    """A malformed scp in the score tree fails its get_breakdown run but the
    suite still prints the summary and exits 0, recording
    'breakdown(failed)' as skipped (round-3 review: the old pipeline
    aborted after every metric had already run)."""
    from urgent2026_challenge_track1_tpu.utils import audio_io

    fs = 16000
    clean = 0.1 * np.sin(2 * np.pi * 220 * np.arange(fs) / fs)
    noisy = clean + 0.01 * np.random.default_rng(0).standard_normal(fs)
    ref = tmp_path / "ref.wav"
    inf = tmp_path / "inf.wav"
    audio_io.write(str(ref), clean.astype(np.float32), fs)
    audio_io.write(str(inf), noisy.astype(np.float32), fs)
    (tmp_path / "inf.scp").write_text(f"u0 {inf}\n")
    (tmp_path / "ref.scp").write_text(f"u0 {ref}\n")
    (tmp_path / "utt2lang").write_text("u0 eng\n")
    (tmp_path / "text").write_text("u0 words\n")
    (tmp_path / "meta.tsv").write_text(
        "id\tfs\tsnr_dB\tlength\tspeech_sid\trir_uid\taugmentation\n"
        f"u0\t{fs}\t5\t{fs}\tlibrispeech_0\tnone\tnone\n"
    )
    primary, p808 = _stub_dnsmos_models(tmp_path)
    out = tmp_path / "out"
    # pre-seed a malformed scp the breakdown loop will trip over
    bogus = out / "score" / "bogus"
    bogus.mkdir(parents=True)
    (bogus / "metric.scp").write_text("u0 not_a_number\n")
    env = {
        # deliberate CLAUDE.md deviation: /root/.axon_site is EXCLUDED from
        # PYTHONPATH so the child CLIs run on genuine CPU (no TPU tunnel)
        "PATH": f"{os.path.dirname(os.sys.executable)}:/usr/bin:/bin",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
        "HOME": os.environ.get("HOME", "/root"),
        "inf_scp": str(tmp_path / "inf.scp"),
        "ref_scp": str(tmp_path / "ref.scp"),
        "output_dir": str(out),
        "utt2lang": str(tmp_path / "utt2lang"),
        "text": str(tmp_path / "text"),
        "meta_tsv": str(tmp_path / "meta.tsv"),
        "nj": "1",
        "device": "cpu",
        "dnsmos_args": f"--primary_model {primary} --p808_model {p808}",
    }
    r = subprocess.run(
        ["bash", str(REPO / "eval_all.sh")],
        capture_output=True, text=True, cwd=str(REPO), env=env, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "FAILED: breakdown for" in r.stderr, r.stderr[-1500:]
    assert "breakdown(failed)" in r.stdout.split("skipped", 1)[1]
    assert "produced (2): intrusive_se dnsmos" in r.stdout, r.stdout[-2000:]
