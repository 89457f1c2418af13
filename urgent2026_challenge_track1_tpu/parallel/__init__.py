"""SPMD parallelism: device mesh construction and sharding helpers."""

from urgent2026_challenge_track1_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
