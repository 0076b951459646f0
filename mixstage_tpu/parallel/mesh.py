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


def make_mesh_2d(dp: int, mp: int,
                 axis_names=("data", "model")) -> Mesh:
    """2-D mesh: batch sharded over ``data``, the mixture decoder's expert
    (group) dimension sharded over ``model`` (see shard_state_mixture)."""
    devices = jax.devices()
    assert dp * mp <= len(devices), \
        f"need {dp * mp} devices, have {len(devices)}"
    return Mesh(np.array(devices[:dp * mp]).reshape(dp, mp), axis_names)


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
    axis = mesh.axis_names[0]
    # on a 2-D (data, model) mesh the batch dim only needs to divide the
    # data-axis extent; it is replicated over the model axis
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
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


def shard_state_mixture(state, mesh: Mesh, num_clusters: int,
                        model_axis: str = "model"):
    """Expert-parallel sharding of the Mix-StAGE mixture decoder.

    The M sub-generators are grouped convs (``feature_group_count=M``,
    jlcss4.py:69-83) whose output-channel dim is M-major — sharding that dim
    over the ``model`` axis places whole experts per device, with zero
    communication through the decoder stack; GSPMD inserts the one psum at
    the soft mixture select (``index_select_outputs`` reduces over M) and the
    matching collectives in the backward pass.  BatchNorm scale/bias/stats of
    the decoder layers are per-output-channel vectors and shard the same way.
    Everything else (encoders, UNet, style table, classifier, D) is
    replicated — at this model size 1-D DP is the perf-optimal layout
    (SURVEY.md §2); this 2-D layout exists to validate and demonstrate
    mixture/expert parallelism end-to-end (dp × ep training step equality is
    pinned by tests/test_parallel.py).

    Requires ``mp`` (the model-axis size) to divide ``num_clusters``; any
    tensor that does not divide cleanly stays replicated.
    """
    import re

    mp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(model_axis, 1)
    repl = replicated(mesh)
    if mp <= 1 or num_clusters % mp != 0:
        return jax.device_put(state, repl)

    decoder_re = re.compile(r"decoder\d+")

    def leaf_sharding(path, leaf) -> NamedSharding:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        in_decoder = any(isinstance(k, str) and decoder_re.fullmatch(k)
                         for k in keys)
        is_mix_logits = ("logits" in keys and "gen" in keys
                         and "classify_cluster" not in keys)
        if not (in_decoder or is_mix_logits):
            return repl
        shape = getattr(leaf, "shape", ())
        if not shape or shape[-1] % mp != 0:
            return repl  # scalars (e.g. optax count) and ragged dims
        spec = [None] * (len(shape) - 1) + [model_axis]
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, leaf_sharding(path, leaf)),
        state)
