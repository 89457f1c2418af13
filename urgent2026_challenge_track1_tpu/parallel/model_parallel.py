"""Model-parallel (sequence/band-sharded) serving over a 2-D device mesh.

The reference's only parallelism is data-parallel DDP (SURVEY.md §2.8); this
module goes beyond parity with a TPU-native model-parallel path for serving
workloads where the batch is too small to fill a mesh (e.g. one long
utterance per request).

Design — exploit the dual-path factorization instead of sharding matmuls:

* the TIME recurrence treats the B*K (batch x band) rows as independent
  sequences, and the BAND recurrence treats the B*T (batch x frame) rows as
  independent ones.  Each recurrence is therefore embarrassingly parallel
  across its rows — no per-step halo or ring is needed (unlike sequence-
  sharding a single RNN, which would serialize on the carried state).
* we place one `with_sharding_constraint` on each recurrence's row-major
  sequence tensor, sharding rows over ALL mesh axes (dp x mp).  GSPMD then
  splits every recurrence across the mesh and inserts the all-to-all /
  collective-permute resharding between the two paths of each layer (rows
  change meaning from (b, k) to (b, t)), riding ICI.
* norms reduce over (T, K, N): GSPMD inserts the cross-device reductions.

The hook is threaded through models/bsrnn.py (``constrain=``) and through
the flowse vector field / sampler (``make_sharded_flow_enhance``), both via
the shared ``_run_layers``.  The sharded path
uses the XLA scan recurrence (``use_pallas_lstm=False``): a Pallas kernel
inside a GSPMD-partitioned program would need a manual shard_map wrapper,
and at multi-chip serving shapes the recurrence rows per chip are small
enough that the scan path's XLA pipelining is the right tool — measure
before changing this.

Reference surface match: inference.py:30-33 (single-GPU enhancement); this
is an additive capability, not a behavior deviation.

Residual-stream anchoring (round 4): the flat dp*mp rows sharding and the
factored (dp, mp) path shardings pad unevenly whenever K or T isn't a
multiple of mp, and GSPMD's direct flat->factored reshard fell back to
"involuntary full rematerialization" (replicate + repartition) at the
bilstm fwd/bwd concat — at EVERY shape, not just degenerate ones (round-3's
shape-dependence claim did not reproduce).  The fix re-anchors the residual
z on a batch-only (dp, None, None, None) layout after each path's residual
add ("anchor" in ``row_constrainer``), splitting the bad jump into
merge-to-dp + split-to-factored, both of which GSPMD lowers to plain
collectives.  Batch-only anchoring keeps every shard dim0-major, so the
XLA:CPU fft thunk restriction (RET_CHECK IsMonotonicWithDim0Major) that
sank the earlier band-layout anchor attempt does not trigger; the absence
of the warning is pinned by tests/test_model_parallel.py::
test_no_involuntary_rematerialization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["row_constrainer", "make_sharded_enhance",
           "make_sharded_flow_enhance"]


def row_constrainer(mesh: Mesh, axes=("dp", "mp")):
    """Callable sharding the dual-path activations over ``axes``.

    Two forms, matching the model's call sites (models/bsrnn.py
    ``_dual_path_layer``):

    * ``constrain(x, "time")`` / ``constrain(x, "band")`` on the 4-D
      (B, T, K, N) tensor BEFORE each path's rows reshape: time shards
      (B over dp, K over mp) and band shards (B over dp, T over mp).  The
      subsequent b-major reshape to (B*K, T, N) / (B*T, K, N) merges two
      already-sharded leading dims, so GSPMD propagates the row sharding
      through the reshape, and the between-path transition is an
      axis-aligned (T, K) all-to-all — constraining the flattened rows
      directly instead made GSPMD fall back to full rematerialization
      ("involuntary full remat" warnings) because the two flattenings have
      no common axis mapping.
    * ``constrain(seq)`` on a 3-D (rows, L, N) tensor shards rows over all
      ``axes`` (used after each recurrence, where the flattening is
      unchanged).  Rows = B*K or B*T; GSPMD pads uneven shards internally.
    """
    present = tuple(a for a in axes if a in mesh.axis_names)
    rows = present if len(present) > 1 else (present[0] if present else None)
    dp = "dp" if "dp" in present else None
    mp = tuple(a for a in present if a != "dp") or None
    if mp is not None and len(mp) == 1:
        mp = mp[0]
    rows_sh = NamedSharding(mesh, P(rows, None, None))
    path_sh = {
        "time": NamedSharding(mesh, P(dp, None, mp, None)),
        "band": NamedSharding(mesh, P(dp, mp, None, None)),
        # canonical residual-stream anchor (batch over dp only): the flat
        # 8-way rows sharding and the factored (dp, mp) path shardings pad
        # unevenly when K/T aren't multiples of mp, and GSPMD's direct
        # flat->factored reshard falls back to "involuntary full
        # rematerialization" at the recurrence concat.  Re-anchoring z after
        # each path splits that jump into merge-to-dp + split-to-factored,
        # both of which GSPMD handles without replication.
        "anchor": NamedSharding(mesh, P(dp, None, None, None)),
    }

    def constrain(x: jnp.ndarray, path: Optional[str] = None) -> jnp.ndarray:
        sharding = rows_sh if path is None else path_sh[path]
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain


def make_sharded_enhance(mesh: Mesh, cfg, stft_cfg, fs: int,
                         lengths: bool = False):
    """Jitted (params, noisy[, lengths]) -> enhanced waveform over ``mesh``.

    Params are replicated (they are small next to activations at serving
    shapes); the wav batch is sharded over dp; inside the model the
    recurrence rows are sharded over dp x mp (see module docstring).
    """
    from urgent2026_challenge_track1_tpu.models import bsrnn as M

    constrain = row_constrainer(mesh)
    rep = NamedSharding(mesh, P())
    wav_sh = NamedSharding(mesh, P("dp" if "dp" in mesh.axis_names else None))

    if lengths:
        def fn(params, noisy, lens):
            wav, _ = M.bsrnn_se_apply(params, cfg, stft_cfg, noisy, fs,
                                      lengths=lens, constrain=constrain)
            return wav

        return jax.jit(fn, in_shardings=(rep, wav_sh, rep),
                       out_shardings=wav_sh)

    def fn(params, noisy):
        wav, _ = M.bsrnn_se_apply(params, cfg, stft_cfg, noisy, fs,
                                  constrain=constrain)
        return wav

    return jax.jit(fn, in_shardings=(rep, wav_sh), out_shardings=wav_sh)


def make_sharded_flow_enhance(mesh: Mesh, cfg, fs: int, N: int = 15,
                              solver: str = "euler", lengths: bool = False):
    """Jitted (params, key, noisy[, lengths]) -> flowse sample over ``mesh``.

    Same design as ``make_sharded_enhance`` for the generative family: the
    vector-field net's recurrence rows are sharded over dp x mp at every
    sampler step via the ``constrain`` hook threaded through
    ``flowse_enhance``."""
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM

    constrain = row_constrainer(mesh)
    rep = NamedSharding(mesh, P())
    wav_sh = NamedSharding(mesh, P("dp" if "dp" in mesh.axis_names else None))

    if lengths:
        def fn(params, key, noisy, lens):
            return FM.flowse_enhance(params, cfg, key, noisy, fs, N=N,
                                     solver=solver, lengths=lens,
                                     constrain=constrain)

        return jax.jit(fn, in_shardings=(rep, rep, wav_sh, rep),
                       out_shardings=wav_sh)

    def fn(params, key, noisy):
        return FM.flowse_enhance(params, cfg, key, noisy, fs, N=N,
                                 solver=solver, constrain=constrain)

    return jax.jit(fn, in_shardings=(rep, rep, wav_sh), out_shardings=wav_sh)
