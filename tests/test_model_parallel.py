"""Model-parallel (dp x mp) serving path: numerical parity with the
single-device forward on the virtual 8-device CPU mesh (conftest forces it).

Matches no reference behavior (the reference is DDP-only, SURVEY.md §2.8);
this is the beyond-parity sequence/band-sharded serving path of
parallel/model_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.parallel import make_mesh
from urgent2026_challenge_track1_tpu.parallel.model_parallel import (
    make_sharded_enhance,
    row_constrainer,
)

CFG = M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2, causal=False)
STFT = STFTConfig(n_fft=960, hop_length=480)
FS = 8000
RNG = np.random.default_rng(11)


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh("dp=2,mp=4")


def test_sharded_forward_matches_single_device():
    mesh = _mesh()
    params = M.init_bsrnn(jax.random.PRNGKey(0), CFG)
    noisy = jnp.asarray(0.1 * RNG.standard_normal((2, FS)).astype(np.float32))
    ref, _ = jax.jit(
        lambda p, x: M.bsrnn_se_apply(p, CFG, STFT, x, FS)
    )(params, noisy)
    fn = make_sharded_enhance(mesh, CFG, STFT, FS)
    got = fn(params, noisy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # the output really is dp-sharded over the mesh
    assert len(got.sharding.device_set) >= 2


def test_sharded_masked_forward_matches_single_device():
    mesh = _mesh()
    params = M.init_bsrnn(jax.random.PRNGKey(1), CFG)
    noisy = jnp.asarray(0.1 * RNG.standard_normal((2, FS)).astype(np.float32))
    lens = jnp.asarray([FS, FS - 1234], np.int32)
    ref, _ = jax.jit(
        lambda p, x, l: M.bsrnn_se_apply(p, CFG, STFT, x, FS, lengths=l)
    )(params, noisy, lens)
    fn = make_sharded_enhance(mesh, CFG, STFT, FS, lengths=True)
    got = fn(params, noisy, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_constrainer_tolerates_missing_axes():
    mesh = _mesh()
    c = row_constrainer(mesh, axes=("dp",))
    x = jnp.zeros((4, 3, 2))
    assert c(x).shape == x.shape


def test_sharded_flow_enhance_matches_single_device():
    """flowse serving over the dp x mp mesh equals the single-device sampler
    (the constrain hook rides the shared _run_layers; round-3 review found
    the hook was documented but not threaded)."""
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
    from urgent2026_challenge_track1_tpu.parallel.model_parallel import (
        make_sharded_flow_enhance,
    )

    mesh = _mesh()
    fcfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=8,
                           num_layer=1)
    params = FM.init_flowse(jax.random.PRNGKey(2), fcfg)
    noisy = jnp.asarray(0.1 * RNG.standard_normal((2, FS)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    ref = jax.jit(
        lambda p, k, x: FM.flowse_enhance(p, fcfg, k, x, FS, N=3)
    )(params, key, noisy)
    fn = make_sharded_flow_enhance(mesh, fcfg, FS, N=3)
    got = fn(params, key, noisy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    assert len(got.sharding.device_set) >= 2


def test_mp_train_step_matches_single_device():
    """Model-parallel TRAINING: one optimizer step over the dp x mp mesh
    (constrain threaded through make_train_step) produces the same loss and
    updated params as the unsharded step — GSPMD shards the forward AND
    backward activations while params/grads stay replicated."""
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.parallel import replicated, shard_batch
    from urgent2026_challenge_track1_tpu.train import trainer as TR

    mesh = _mesh()
    cfg = Config()
    bundle = TR.ModelBundle("discriminative", CFG, STFT)
    opt = TR.make_optimizer(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(5), CFG)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(6)
    clean = 0.1 * RNG.standard_normal((2, FS)).astype(np.float32)
    noisy = clean + 0.02 * RNG.standard_normal((2, FS)).astype(np.float32)
    lens = np.asarray([FS, FS - 777], np.int32)

    def fresh(tree):
        # real copies: the steps donate their params/opt buffers, and
        # jnp.asarray would alias (donation then deletes the shared array)
        return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

    step_ref = TR.make_train_step(bundle, opt, cfg, FS)
    p1, o1, _, m1 = step_ref(fresh(params), fresh(opt_state), None, key,
                             jnp.asarray(clean), jnp.asarray(noisy),
                             jnp.asarray(lens))

    rep = replicated(mesh)
    step_mp = TR.make_train_step(bundle, opt, cfg, FS,
                                 constrain=row_constrainer(mesh))
    batch = shard_batch(mesh, (clean, noisy, lens))
    p2, o2, _, m2 = step_mp(jax.device_put(fresh(params), rep),
                            jax.device_put(fresh(opt_state), rep),
                            None, key, *batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        p1, p2,
    )


def test_mp_flowse_val_step_matches_single_device():
    """flowse_loss with the constrain hook (mp mesh) equals the unsharded
    loss — same key => same (t, noise) draws, so the comparison is exact up
    to resharding roundoff."""
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
    from urgent2026_challenge_track1_tpu.parallel import replicated, shard_batch
    from urgent2026_challenge_track1_tpu.train import trainer as TR

    mesh = _mesh()
    cfg = Config()
    fcfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=8,
                           num_layer=1)
    bundle = TR.ModelBundle("flowse", fcfg, fcfg.stft_cfg)
    params = FM.init_flowse(jax.random.PRNGKey(7), fcfg)
    key = jax.random.PRNGKey(8)
    clean = 0.1 * RNG.standard_normal((2, FS)).astype(np.float32)
    noisy = clean + 0.02 * RNG.standard_normal((2, FS)).astype(np.float32)
    lens = np.asarray([FS, FS - 400], np.int32)

    ref = TR.make_val_step(bundle, cfg, FS)(
        params, key, jnp.asarray(clean), jnp.asarray(noisy), jnp.asarray(lens)
    )
    batch = shard_batch(mesh, (clean, noisy, lens))
    got = TR.make_val_step(bundle, cfg, FS, constrain=row_constrainer(mesh))(
        jax.device_put(params, replicated(mesh)), key, *batch
    )
    np.testing.assert_allclose(float(ref["loss"]), float(got["loss"]),
                               rtol=1e-5)


def test_no_involuntary_rematerialization():
    """The driver's multi-chip artifact must be GSPMD-warning-free (VERDICT
    r3 item 5): the batch-only residual anchor in row_constrainer splits the
    flat->factored reshard that used to hit "involuntary full
    rematerialization" at the recurrence concat.  Runs the REAL
    ``dryrun_multichip`` in a subprocess (the warning is a C++ LOG to
    stderr, invisible in-process) and asserts the log is clean."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # positive signal first (ADVICE r4): prove the dryrun actually exercised
    # the mp paths this guard covers, so the negative assertion below cannot
    # pass vacuously if dryrun_multichip is ever refactored
    for want in ("discriminative ok", "flowse ok", "model-parallel"):
        assert want in proc.stdout, (want, proc.stdout[-2000:])
    # The exact warning string "Involuntary full rematerialization" is the
    # spmd_partitioner C++ LOG observed under jax 0.9.0 / its bundled XLA
    # (jaxlib 0.9.x, 2026-01).  If a future XLA rewords it, the positive
    # asserts above still hold but this guard must be re-pinned — check
    # xla/service/spmd/spmd_partitioner.cc for the current wording when
    # bumping JAX.
    assert "Involuntary full rematerialization" not in proc.stderr, (
        proc.stderr[-4000:]
    )
