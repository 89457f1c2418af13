#!/bin/env python
"""Flow-matching sampler inference RTF on TPU (flagship BSRNN_flowse,
N=15 Euler NFE as in the reference default)."""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 4, 8]
    cfg = FM.FlowSEConfig(
        bsrnn_hidden=384, num_layer=6, compute_dtype="bfloat16", use_pallas_lstm=True
    )
    params = FM.init_flowse(jax.random.PRNGKey(0), cfg)
    fs, seconds = 48000, 4
    key = jax.random.PRNGKey(1)
    for B in batches:
        noisy = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, fs * seconds)).astype(np.float32)
            * 0.1
        )
        fn = jax.jit(
            lambda p, key, x: FM.flowse_enhance(p, cfg, key, x, fs, N=15, solver="euler")
        )
        fn(params, key, noisy).block_until_ready()
        n = 5
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(params, key, noisy).block_until_ready()
            times.append(time.perf_counter() - t0)
        # median: the remote-TPU tunnel occasionally stalls one dispatch
        dt = float(np.median(times))
        audio_s = B * seconds
        print(
            f"flowse enhance (N=15 NFE, B={B}): {dt*1e3:.1f} ms "
            f"(RTF {audio_s/dt:.1f}x, {dt*1e3/15:.1f} ms/NFE)",
            flush=True,
        )


if __name__ == "__main__":
    main()
