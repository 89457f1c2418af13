"""Eval CLI --nsplits/--job sharding: suffixed scps, disjoint coverage."""

import os
import subprocess
import sys

import numpy as np
import scipy.signal

from urgent2026_challenge_track1_tpu.utils import audio_io


def _mk(tmp_path, n=5):
    rng = np.random.default_rng(0)
    fs = 16000
    b, a = scipy.signal.butter(2, [300 / (fs / 2), 3400 / (fs / 2)], "bandpass")
    ref_lines, inf_lines = [], []
    for i in range(n):
        x = scipy.signal.lfilter(b, a, rng.standard_normal(fs)).astype(np.float32)
        x /= np.abs(x).max() * 2
        y = x + (0.05 * rng.standard_normal(fs)).astype(np.float32)
        rp, ip = tmp_path / f"r{i}.wav", tmp_path / f"i{i}.wav"
        audio_io.write(str(rp), x, fs)
        audio_io.write(str(ip), y, fs)
        ref_lines.append(f"u{i} {rp}")
        inf_lines.append(f"u{i} {ip}")
    (tmp_path / "ref.scp").write_text("\n".join(ref_lines) + "\n")
    (tmp_path / "inf.scp").write_text("\n".join(inf_lines) + "\n")
    return fs


def test_dnsmos_style_sharding_without_backend(tmp_path):
    """Backend-less CLIs fail cleanly with an actionable message."""
    _mk(tmp_path, 3)
    # deliberate CLAUDE.md deviation: dropping /root/.axon_site from
    # PYTHONPATH is what lets JAX_PLATFORMS=cpu stick in the child CLI
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "/root/repo/evaluation_metrics/calculate_nonintrusive_dnsmos.py",
         "--inf_scp", str(tmp_path / "inf.scp"), "--output_dir", str(tmp_path / "s")],
        capture_output=True, text=True, env=env, cwd="/root/repo/evaluation_metrics",
    )
    assert r.returncode != 0
    assert "DNSMOS" in (r.stdout + r.stderr)


def test_intrusive_runs_per_utt_and_breakdownable(tmp_path):
    _mk(tmp_path, 4)
    # deliberate CLAUDE.md deviation: dropping /root/.axon_site from
    # PYTHONPATH is what lets JAX_PLATFORMS=cpu stick in the child CLI
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "/root/repo/evaluation_metrics/calculate_intrusive_se_metrics.py",
         "--ref_scp", str(tmp_path / "ref.scp"), "--inf_scp", str(tmp_path / "inf.scp"),
         "--output_dir", str(tmp_path / "score"), "--nj", "1"],
        capture_output=True, text=True, env=env, cwd="/root/repo/evaluation_metrics",
    )
    assert r.returncode == 0, r.stderr
    lines = (tmp_path / "score" / "ESTOI.scp").read_text().strip().splitlines()
    assert len(lines) == 4
    uids = {l.split()[0] for l in lines}
    assert uids == {f"u{i}" for i in range(4)}


def test_shard_helper_covers_all_disjoint(tmp_path):
    sys.path.insert(0, "/root/repo/evaluation_metrics")
    import argparse

    from _shared import shard

    pairs = [(f"u{i}", f"p{i}") for i in range(10)]
    seen = []
    for job in (1, 2, 3):
        args = argparse.Namespace(nsplits=3, job=job)
        part, suffix = shard(list(pairs), args)
        assert suffix == f".{job}"
        seen += part
    assert seen == pairs  # full disjoint coverage in order
