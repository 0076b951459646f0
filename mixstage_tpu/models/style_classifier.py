"""Speaker style classifier (also the Inception-Score feature net).

Parity target: ``StyleClassifier_G`` (reference
``/root/reference/src/model/style_classifier.py:14-34``): six stride-2
ConvNormRelu blocks (plain ReLU) collapsing a 64-frame pose window to speaker
logits.  A frozen trained copy is the feature network for the style Inception
Score metric (reference metrics.py:305-321).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mixstage_tpu.models.layers import ConvNormRelu

Dtype = Any


class StyleClassifier_G(nn.Module):
    time_steps: int = 64
    in_channels: int = 256   # pose feature count (96 after joint masking)
    num_speakers: int = 2    # == len(style_dict) in the reference
    p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = True, **kwargs):
        """x: (B, T, in_channels) pose window → (B, num_speakers) logits."""
        common = dict(type="1d", downsample=True, p=self.p, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        plan = [(self.in_channels, 64), (64, 128), (128, 128), (128, 256),
                (256, 256), (256, self.num_speakers)]
        for i, (cin, cout) in enumerate(plan):
            x = ConvNormRelu(cin, cout, name=f"classifier{i}", **common)(x, train=train)
        # (B, T/64, num_speakers) → (B, num_speakers); T == 64 collapses to 1
        y_cap = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0, :]
        internal_losses = []
        return y_cap, internal_losses
