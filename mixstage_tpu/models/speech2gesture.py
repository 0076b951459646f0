"""Speech2Gesture baseline generator + the shared pose discriminator.

Parity targets: ``Speech2Gesture_G`` (reference
``/root/reference/src/model/speech2gesture.py:13-39``) and
``Speech2Gesture_D`` (speech2gesture.py:41-74) — the latter is THE
discriminator used by every GAN model in the reference (it operates on pose
*velocity* sequences, see gan.py:114-115).

Layout is channels-last (B, T, C); see models/layers.py for design notes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from mixstage_tpu.models.layers import AudioEncoder, ConvNormRelu, UNet1D

Dtype = Any


class Speech2Gesture_G(nn.Module):
    """Audio → UNet → 4 convs → 1x1 logits → pose.

    Input: (B, T_audio, n_mels) log-mel window.  Output: (B, time_steps,
    out_feats) pose plus an (empty) list of internal losses, mirroring the
    reference contract.
    """

    time_steps: int = 64
    in_channels: int = 256
    out_feats: int = 104
    p: float = 0.0
    # AudioEncoder per-layer TPU relowering plan (exact math, same params;
    # see layers.resolve_audio_lowerings).  None = native convs.
    audio_lowerings: Optional[Any] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, time_steps: Optional[int] = None,
                 train: bool = True, **kwargs):
        # time_steps=None → audio encoder resizes to its own input length
        # (whole-interval sampling, reference trainer.py:778-786)
        common = dict(p=self.p, dtype=self.dtype, param_dtype=self.param_dtype)
        x = AudioEncoder(output_feats=time_steps, name="audio_encoder",
                         lowerings=self.audio_lowerings,
                         **common)(x, time_steps=time_steps, train=train)
        x = UNet1D(self.in_channels, self.in_channels, name="unet",
                   **common)(x, train=train)
        for i in range(4):
            x = ConvNormRelu(self.in_channels, self.in_channels, type="1d",
                             leaky=True, name=f"decoder{i}", **common)(x, train=train)
        x = nn.Conv(self.out_feats, kernel_size=(1,), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="logits")(x)
        internal_losses = []
        return x, internal_losses


class Speech2Gesture_D(nn.Module):
    """Strided conv stack on (velocity) pose sequences → patch scores.

    Input: (B, T, in_channels).  Output: (B, T') scores when out_shape == 1,
    else (B, T', out_shape); plus empty internal losses.
    """

    in_channels: int = 104
    out_channels: int = 64
    n_downsampling: int = 2
    p: float = 0.0
    groups: int = 1
    out_shape: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        g = self.groups
        # conv1: plain conv + leaky relu, no norm (speech2gesture.py:50-51)
        x = nn.Conv(self.out_channels * g, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], feature_group_count=g, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        common = dict(type="1d", leaky=True, p=self.p, groups=g,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        ch_mul = 1
        for n in range(1, self.n_downsampling):
            ch_mul_n = min(2 ** n, 8)
            x = ConvNormRelu(self.out_channels * ch_mul, self.out_channels * ch_mul_n,
                             downsample=True, name=f"conv2_{n - 1}", **common)(x, train=train)
            ch_mul = ch_mul_n
        ch_mul_new = min(2 ** self.n_downsampling, 8)
        x = ConvNormRelu(self.out_channels * ch_mul, self.out_channels * ch_mul_new,
                         kernel_size=4, stride=1, name="conv3", **common)(x, train=train)
        x = nn.Conv(self.out_shape * g, kernel_size=(4,), strides=(1,),
                    padding="VALID", feature_group_count=g, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="logits")(x)
        if self.out_shape == 1 and self.groups == 1:
            x = x[..., 0]
        internal_losses = []
        return x, internal_losses
