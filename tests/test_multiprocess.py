"""Two-process jax.distributed smoke test (VERDICT r1 item 8): exercises the
multi-host path — coordinator bring-up over loopback, process_index-keyed
data sharding, make_array_from_process_local_data assembly, and a jitted
data-parallel train step with replicated params — on CPU devices.

The single-controller analog of the reference's DDP launch
(train_se.py:74-84); our gate lives at train_se.py:40-45."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).parent.parent

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
        local_device_ids=[0, 1],
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, %(repo)r)
    from urgent2026_challenge_track1_tpu.parallel import make_mesh, replicated, shard_batch

    mesh = make_mesh("dp=-1")
    assert mesh.devices.size == 4

    # rank-sharded data: each process contributes its local half of batch 8
    rank = jax.process_index()
    local = np.full((4, 16), float(rank), np.float32)
    batch = shard_batch(mesh, (local,))[0]
    assert batch.shape == (8, 16), batch.shape

    # one data-parallel step: params replicated, grad all-reduced by XLA
    w = jax.device_put(np.ones((16,), np.float32), replicated(mesh))

    @jax.jit
    def step(w, x):
        loss = jnp.mean((x @ w) ** 2)
        g = jax.grad(lambda w_: jnp.mean((x @ w_) ** 2))(w)
        return loss, w - 0.1 * g

    loss, w2 = step(w, batch)
    # global mean over both processes' shards: ranks contribute 0s and 1s
    expect = np.mean((np.concatenate([np.zeros((4, 16)), np.ones((4, 16))]) @ np.ones(16)) ** 2)
    got = float(jax.device_get(loss))
    assert abs(got - expect) < 1e-4, (got, expect)
    # updated params stay replicated and identical across processes
    w2_local = np.asarray(jax.device_get(w2.addressable_shards[0].data))

    # SPMD loader: both processes must agree on each step's (fs, shape) and
    # assemble a (batch_size*world, T) global batch from their local rows
    data_dir = sys.argv[3]
    from urgent2026_challenge_track1_tpu.data.dataset import (
        GroupedBatchSampler, PreSimulatedDataset, PrefetchLoader,
    )
    ds = PreSimulatedDataset(
        f"{data_dir}/spk1.scp", f"{data_dir}/wav.scp", f"{data_dir}/utt2fs",
        f"{data_dir}/speech_length.scp",
    )
    world = jax.process_count()
    sampler = GroupedBatchSampler(ds, batch_size=2 * world, rank=rank,
                                  world_size=world, drop_last=True,
                                  spmd_rows=True)
    sampler.set_epoch(0)
    loader = PrefetchLoader(ds, sampler, num_workers=2,
                            row_slice=(rank, world))
    sig = []
    for clean, noisy, fs, lengths in loader:
        assert clean.shape[0] == 2  # local rows = batch_size
        g = shard_batch(mesh, (clean[:, 0],))[0]
        assert g.shape[0] == 2 * world  # global assembly succeeded
        sig.append((int(fs), clean.shape[2]))
    print(f"SIG rank={rank} {sig}", flush=True)
    print(f"OK rank={rank} loss={got:.4f} w2_0={w2_local[0]:.6f}", flush=True)
    """
)


def _toy_data(root):
    import numpy as np

    from urgent2026_challenge_track1_tpu.utils import audio_io

    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        fs = 8000 if i % 2 == 0 else 16000
        T = fs // 2 + 731 * i
        uid = f"utt{i:02d}"
        w = (0.1 * rng.standard_normal(T)).astype(np.float32)
        audio_io.write(str(root / f"{uid}.wav"), w, fs)
        rows.append((uid, fs, T))
    for name, col in (("spk1.scp", None), ("wav.scp", None)):
        with open(root / name, "w") as f:
            for uid, fs, T in rows:
                f.write(f"{uid} {root}/{uid}.wav\n")
    with open(root / "utt2fs", "w") as f:
        for uid, fs, T in rows:
            f.write(f"{uid} {fs}\n")
    with open(root / "speech_length.scp", "w") as f:
        for uid, fs, T in rows:
            f.write(f"{uid} {T}\n")


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    _toy_data(tmp_path)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": str(REPO)})
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"OK rank={i}" in out
    # both ranks computed the same global loss and update
    w0 = outs[0].split("w2_0=")[1].split()[0]
    w1 = outs[1].split("w2_0=")[1].split()[0]
    assert w0 == w1
    # both ranks stepped through the identical (fs, T) sequence and each
    # step's global batch assembled — the SPMD loader contract
    sig0 = outs[0].split("SIG rank=0 ")[1].splitlines()[0]
    sig1 = outs[1].split("SIG rank=1 ")[1].splitlines()[0]
    assert sig0 == sig1 and sig0 != "[]"
