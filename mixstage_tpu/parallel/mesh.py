"""Device mesh + data-parallel sharding.

The reference is single-device (SURVEY.md §2 bottom: no distributed backend
anywhere).  The TPU-native equivalent is GSPMD data parallelism: a 1-D
``jax.sharding.Mesh`` over the chips, train state replicated, batches sharded
on the leading axis.  jit-compiled step functions then run SPMD and XLA
inserts the gradient all-reduces (psum over ICI) automatically — both the G
and D steps are all-reduced, and because the GAN/curriculum coins are flipped
on the host, every replica takes the same branch (the replica-consistency
design point called out in SURVEY.md §5).

Multi-host pods: call ``jax.distributed.initialize()`` before ``make_mesh``
and feed each process its data shard (host loading is per-process already).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices if num_devices and num_devices > 0 else len(devices)
    n = min(n, len(devices))
    return Mesh(np.array(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, leading_axis: int = 0):
    """Device-put a dict batch with ``leading_axis`` sharded over the mesh.

    ``leading_axis=0`` is the normal per-step batch; the fused scan driver
    stacks k batches to (k, B, ...) and shards axis 1.  Arrays whose batch
    dim does not divide the mesh size are replicated instead (correct, just
    not parallel) — this only happens on ragged final batches and the
    batch-1 sampling path.
    """
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    repl = replicated(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim > leading_axis and x.shape[leading_axis] % n == 0:
            spec = [None] * (leading_axis + 1)
            spec[leading_axis] = axis
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)


def replicate_state(state, mesh: Mesh):
    """Replicate the train state across the mesh."""
    return jax.device_put(state, replicated(mesh))
