"""Soft mixture-of-generators output selection.

Parity target: ``index_select_outputs`` in the reference
(``/root/reference/src/model/joint_late_cluster_soft_style.py:106-115``):
given per-generator outputs and per-frame soft attention over generators,
return the attention-weighted sum.

TPU note: this is a tiny batched contraction; expressed as an einsum it fuses
into the surrounding convolutions under XLA, so no Pallas kernel is needed for
it in isolation (the fused decoder kernel covers the whole chain).
"""

from __future__ import annotations

import jax.numpy as jnp


def index_select_outputs(x, labels, groups: int):
    """Combine grouped outputs with per-frame soft labels.

    Args:
      x: (B, T, groups * out_feats) grouped decoder outputs, laid out as
        ``groups`` contiguous blocks of ``out_feats`` channels.
      labels: (B, T, groups) soft attention weights (rows need not be
        normalized here; callers pass softmax outputs).
      groups: number of mixture components M.

    Returns:
      (B, T, out_feats) soft mixture: sum_m labels[..., m] * x_m.
    """
    B, T, C = x.shape
    x = x.reshape(B, T, groups, C // groups)
    labels = labels.reshape(B, T, groups)
    return jnp.einsum("btmf,btm->btf", x, labels)
