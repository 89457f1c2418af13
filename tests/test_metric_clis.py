"""Smoke tests for all nine model-based metric CLIs (VERDICT r1 item 10):
each CLI's argument parsing, scp reading, --nsplits/--job sharding, and
BackendUnavailable path are exercised end-to-end via subprocess — no model
weights are present in this image, so a clean actionable exit is the
expected behavior (reference CLIs would download/load the models here)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent

# (script, needs_ref, needs_meta, extra_args)
CLIS = [
    ("calculate_nonintrusive_nisqa.py", False, False, []),
    ("calculate_nonintrusive_utmos.py", False, False, []),
    ("calculate_nonintrusive_scoreq.py", False, False, []),
    ("calculate_speechbert_score.py", True, False, []),
    ("calculate_phoneme_similarity.py", True, False, []),
    ("calculate_speaker_similarity.py", True, False, []),
    ("calculate_emotion_similarity.py", True, False, []),
    ("calculate_lid_accuracy.py", False, True, []),
    ("calculate_wer.py", False, True, ["--utt2lang", "UTT2LANG"]),
]


@pytest.fixture(scope="module")
def scps(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clis")
    from urgent2026_challenge_track1_tpu.utils import audio_io

    fs = 16000
    rng = np.random.default_rng(0)
    inf_lines, ref_lines, meta_lines, lang_lines = [], [], [], []
    for i in range(3):
        w = tmp / f"u{i}.wav"
        audio_io.write(str(w), 0.05 * rng.standard_normal(fs), fs)
        inf_lines.append(f"u{i} {w}")
        ref_lines.append(f"u{i} {w}")
        meta_lines.append(f"u{i} some transcript words")
        lang_lines.append(f"u{i} eng")
    (tmp / "inf.scp").write_text("\n".join(inf_lines) + "\n")
    (tmp / "ref.scp").write_text("\n".join(ref_lines) + "\n")
    (tmp / "meta.tsv").write_text("\n".join(meta_lines) + "\n")
    (tmp / "utt2lang").write_text("\n".join(lang_lines) + "\n")
    return tmp


@pytest.mark.parametrize("script,needs_ref,needs_meta,extra", CLIS)
def test_cli_reaches_backend_gate(scps, tmp_path, script, needs_ref, needs_meta, extra):
    cmd = [sys.executable, str(REPO / "evaluation_metrics" / script),
           "--inf_scp", str(scps / "inf.scp"),
           "--output_dir", str(tmp_path / "out"),
           "--nsplits", "2", "--job", "1"]
    if needs_ref:
        cmd += ["--ref_scp", str(scps / "ref.scp")]
    if needs_meta:
        cmd += ["--meta_tsv", str(scps / "meta.tsv")]
    cmd += [a.replace("UTT2LANG", str(scps / "utt2lang")) for a in extra]
    # deliberate deviation from the repo PYTHONPATH rule: /root/.axon_site is
    # EXCLUDED so the axon sitecustomize never pins the TPU backend — these
    # smoke tests must exercise genuine CPU-only behavior in the children
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO),
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": str(REPO)})
    combined = r.stdout + r.stderr
    # no weights/egress in-image: the CLI must exit with the dedicated
    # backend-unavailable code 86 (so eval_all.sh can skip-and-report),
    # carrying the actionable message, not a traceback
    assert r.returncode == 86, (r.returncode, combined[-2000:])
    assert "SKIPPED (backend unavailable)" in combined, combined[-2000:]
    assert "Traceback" not in combined, combined[-2000:]


@pytest.mark.parametrize("script,needs_ref,needs_meta,extra", CLIS)
def test_cli_rejects_bad_job_args(scps, tmp_path, script, needs_ref, needs_meta, extra):
    """Missing required args exit with argparse error (code 2)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "evaluation_metrics" / script)],
        capture_output=True, text=True, cwd=str(REPO),
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO)},
    )
    assert r.returncode == 2
    assert "usage:" in (r.stdout + r.stderr)
