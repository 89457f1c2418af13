"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Mirrors the multi-host test strategy from SURVEY.md §4: multi-chip sharding is
validated on `--xla_force_host_platform_device_count=8` CPU devices; the real
TPU chip is only used by bench.py.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU) and a
# sitecustomize module registers the axon PJRT plugin at interpreter start, so
# plain env-var overrides are too late.  jax.config.update() still works
# because the backend itself is initialized lazily on first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
