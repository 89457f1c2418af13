"""Device mesh + sharding: the TPU-native replacement for the reference's DDP.

The reference's only model-parallel strategy is data parallelism via
PyTorch-Lightning DDP + NCCL all-reduce (``train_se.py:74-83``; SURVEY.md
§2.8).  On TPU the same program becomes: one `jax.jit`-compiled train step
whose batch inputs carry a `NamedSharding` over a 1-D ``dp`` mesh and whose
params/opt-state are replicated — XLA inserts the gradient all-reduce over
ICI automatically; there is no NCCL analog to write.

``mesh_shape`` config strings ("dp=-1", "dp=8") pick the mesh size; -1 means
all visible devices.  Multi-host: each process feeds its local shard via
`jax.make_array_from_process_local_data` (the analog of the reference's
rank-sharded sampler, ``dataset.py:361``).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


def parse_mesh_shape(spec: str) -> dict[str, int]:
    """'dp=8' / 'dp=-1' / 'dp=4,tp=2' -> ordered {axis: size}."""
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def make_mesh(mesh_shape: str = "dp=-1", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_shape(mesh_shape)
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    n = int(np.prod(sizes))
    mesh_devices = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(mesh_devices, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host numpy batch pytree onto the mesh, batch-sharded on axis 0.

    Scalars / 0-d entries are replicated.  In multi-process mode each host
    passes its local slice and the global array is assembled over processes.
    """
    sh_b = batch_sharding(mesh, axis)
    sh_r = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        sh = sh_r if x.ndim == 0 else sh_b
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)
