#!/bin/env python
"""Bounded remote-TPU health probe.

The axon tunnel blocks PJRT calls indefinitely when the remote worker is
down (even ``jax.devices()`` hangs, unkillable from inside the process), so
this probe runs the check in a child process with a hard timeout and prints
one line: ``TPU OK <secs>s`` or ``TPU DOWN (<reason>)``.  Exit code 0/1.

Usage: python scripts/tpu_health.py [--timeout 90]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

CHILD_CODE = """
import time
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print(f"HEALTH_OK {d[0].platform} {time.time()-t0:.1f}")
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=90)
    args = ap.parse_args()
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD_CODE],
            capture_output=True, text=True, timeout=args.timeout,
            env=os.environ,
        )
    except subprocess.TimeoutExpired:
        print(f"TPU DOWN (no response in {args.timeout}s)")
        return 1
    for line in r.stdout.splitlines():
        if line.startswith("HEALTH_OK"):
            _, platform, secs = line.split()
            print(f"TPU OK platform={platform} first_op={secs}s "
                  f"total={time.time()-t0:.1f}s")
            return 0
    print(f"TPU DOWN (child rc={r.returncode}: {r.stderr.strip()[-200:]})")
    return 1


if __name__ == "__main__":
    sys.exit(main())
