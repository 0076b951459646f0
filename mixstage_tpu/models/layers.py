"""TPU-native layer zoo for Mix-StAGE models.

Functional flax.linen re-design of the reference layer vocabulary
(``/root/reference/src/model/layers.py:32-696``).  Differences from the
reference are deliberate TPU choices, not omissions:

* layout is channels-last ``(B, T, C)`` / ``(B, H, W, C)`` — the natural XLA
  TPU layout — instead of torch's ``(B, C, T)``;
* grouped convolutions (the mixture-of-generators primitive) lower to a single
  ``lax.conv_general_dilated`` with ``feature_group_count`` so the MXU sees one
  large batched contraction;
* batch-norm state lives in the ``batch_stats`` collection (explicit, pjit-able)
  rather than module buffers;
* dropout/curriculum randomness comes from explicit PRNG keys, making every
  forward replica-consistent under data parallelism by construction.

Channel-count semantics mirror the reference exactly (e.g. ``ConvNormRelu``
multiplies ``in/out_channels`` by ``groups`` — layers.py:58-59) so parameter
shapes line up 1:1 for parity checks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _pad_amount(kernel_size, stride):
    """Per-dim 'same-ish' padding used by the reference: int((k - s) / 2)
    (layers.py:46-55)."""
    if isinstance(kernel_size, int) and isinstance(stride, int):
        return int((kernel_size - stride) / 2)
    ks = _pair(kernel_size)
    st = _pair(stride)
    if isinstance(kernel_size, int):
        return tuple(int((kernel_size - s) / 2) for s in st)
    if isinstance(stride, int):
        return tuple(int((k - stride) / 2) for k in ks)
    # NOTE: the reference's tuple/tuple branch (layers.py:53) zips kernel with
    # kernel — a bug it never exercises; we use the evident intent (k - s) / 2.
    return tuple(int((k - s) / 2) for k, s in zip(ks, st))


class ConvNormRelu(nn.Module):
    """Conv → BatchNorm → Dropout-order-fixed → (Leaky)ReLU.

    Parity target: reference ``ConvNormRelu`` (layers.py:32-78), which applies
    conv → dropout → norm → relu; we keep that exact op order.
    ``in_channels``/``out_channels`` are per-group like the reference.
    """

    in_channels: int
    out_channels: int
    type: str = "1d"           # '1d' | '2d'
    leaky: bool = False
    downsample: bool = False
    kernel_size: Optional[Any] = None
    stride: Optional[Any] = None
    padding: Optional[Any] = None
    p: float = 0.0             # dropout probability
    groups: int = 1
    lowering: str = "conv"     # 'conv' | 'einsum' (see __call__)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kernel_size, stride = self.kernel_size, self.stride
        if kernel_size is None and stride is None:
            kernel_size, stride = (3, 1) if not self.downsample else (4, 2)
        padding = self.padding if self.padding is not None else _pad_amount(kernel_size, stride)

        ndim = 1 if self.type == "1d" else 2
        ks = (kernel_size,) * ndim if isinstance(kernel_size, int) else tuple(kernel_size)
        st = (stride,) * ndim if isinstance(stride, int) else tuple(stride)
        pad = (padding,) * ndim if isinstance(padding, int) else tuple(padding)
        pad = [(p_, p_) for p_ in pad]

        features = self.out_channels * self.groups
        if self.lowering == "einsum":
            # same params ('conv'/{kernel,bias}), dot_general lowering — used
            # under expert-parallel sharding where XLA's partitioner handles
            # feature-sharded convs pathologically (see _GroupedConv1DEinsum)
            assert self.type == "1d" and st == (1,), \
                "einsum lowering supports stride-1 1d convs"
            x = _GroupedConv1DEinsum(features=features, groups=self.groups,
                                     kernel_size=ks[0], padding=pad[0][0],
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="conv")(x)
        else:
            x = nn.Conv(features=features, kernel_size=ks, strides=st,
                        padding=pad, feature_group_count=self.groups,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv")(x)
        x = nn.Dropout(rate=self.p, deterministic=not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(x)
        negative_slope = 0.2 if self.leaky else 0.0
        return nn.leaky_relu(x, negative_slope=negative_slope) if self.leaky else nn.relu(x)


def upsample_nearest_2x(x):
    """Nearest-neighbour temporal upsampling on (B, T, C)."""
    return jnp.repeat(x, 2, axis=1)


class UNet1D(nn.Module):
    """1D U-Net with additive (residual) skip connections.

    Parity target: reference ``UNet1D`` (layers.py:80-157): 2 pre convs,
    ``max_depth`` strided down-convs, then ``max_depth`` [nearest-up ×2 +
    residual add + conv] stages.  Requires T divisible by 2^max_depth.
    """

    input_channels: int
    output_channels: int
    max_depth: int = 5
    kernel_size: Optional[int] = None
    stride: Optional[int] = None
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_bottleneck: bool = False):
        T = x.shape[1]
        assert T % (2 ** self.max_depth) == 0, (
            f"UNet1D input length {T} must be divisible by 2^{self.max_depth}"
            " (reference asserts the same, layers.py:136-138)")
        common = dict(type="1d", leaky=True, kernel_size=self.kernel_size,
                      stride=self.stride, p=self.p, groups=self.groups,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvNormRelu(self.input_channels, self.output_channels,
                         downsample=False, name="pre0", **common)(x, train)
        x = ConvNormRelu(self.output_channels, self.output_channels,
                         downsample=False, name="pre1", **common)(x, train)
        residuals = [x]
        for i in range(self.max_depth):
            x = ConvNormRelu(self.output_channels, self.output_channels,
                             downsample=True, name=f"down{i}", **common)(x, train)
            if i < self.max_depth - 1:
                residuals.append(x)
        bottleneck = x
        for i in range(self.max_depth):
            x = upsample_nearest_2x(x) + residuals[self.max_depth - i - 1]
            x = ConvNormRelu(self.output_channels, self.output_channels,
                             downsample=False, name=f"up{i}", **common)(x, train)
        if return_bottleneck:
            return x, bottleneck
        return x


def _bilinear_axis(x, out_size: int, axis: int):
    """Torch-style bilinear sampling along one axis: half-pixel centers,
    NO antialiasing (``F.interpolate(mode='bilinear', align_corners=False)``).
    jax.image.resize antialiases on downscale, which torch does not."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    src = (jnp.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(x.dtype)
    xlo = jnp.take(x, lo, axis=axis)
    xhi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return xlo * (1 - frac) + xhi * frac


def resize_bilinear_time(x, time_steps: int):
    """Bilinear resize of (B, H, W, C) to (B, time_steps, 1, C), then squeeze
    W — the reference's ``F.interpolate(size=(time_steps, 1))`` at
    layers.py:197, reproduced bit-faithfully (see ``_bilinear_axis``)."""
    x = _bilinear_axis(x, time_steps, axis=1)
    x = _bilinear_axis(x, 1, axis=2)
    return x[:, :, 0, :]


class AudioEncoder(nn.Module):
    """2D conv pyramid over (time, mel) log-spectrogram windows.

    Parity target: reference ``AudioEncoder`` (layers.py:159-199).
    Input (B, T_audio, n_mels) [or (B, T_audio, n_mels, C)]; output
    (B, time_steps, 256).
    """

    output_feats: int = 64
    input_channels: int = 1
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_steps: Optional[int] = None, train: bool = True):
        if x.ndim == 3:
            x = x[..., None]  # (B, T, F, 1)
        if time_steps is None:
            time_steps = x.shape[1]
        common = dict(type="2d", leaky=True, p=self.p, groups=self.groups,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        chans = [(self.input_channels, 64, False), (64, 64, True),
                 (64, 128, False), (128, 128, True),
                 (128, 256, False), (256, 256, True),
                 (256, 256, False)]
        for i, (cin, cout, down) in enumerate(chans):
            x = ConvNormRelu(cin, cout, downsample=down, name=f"conv{i}", **common)(x, train)
        x = ConvNormRelu(256, 256, kernel_size=(3, 8), stride=1, name="conv7",
                         **common)(x, train)
        return resize_bilinear_time(x, time_steps)


class _Conv1DStack(nn.Module):
    """Shared helper: a stack of 1D ConvNormRelu blocks given a channel plan."""

    plan: Sequence[Tuple[int, int, bool]]  # (cin, cout, downsample)
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        common = dict(type="1d", leaky=True, p=self.p, groups=self.groups,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        for i, (cin, cout, down) in enumerate(self.plan):
            x = ConvNormRelu(cin, cout, downsample=down, name=f"conv{i}", **common)(x, train)
        return x


class PoseEncoder(nn.Module):
    """(B, T, pose_feats) → (B, T, 256).  Reference layers.py:201-240."""

    output_feats: int = 64
    input_channels: int = 96
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_steps: Optional[int] = None, train: bool = True):
        plan = [(self.input_channels, 64, False), (64, 64, False),
                (64, 128, False), (128, 128, False),
                (128, 256, False), (256, 256, False)]
        return _Conv1DStack(plan, self.p, self.groups, self.dtype,
                            self.param_dtype, name="stack")(x, train)


class PoseStyleEncoder(nn.Module):
    """Pose → speaker logits via 6× temporal downsampling + mean.

    Reference layers.py:246-289.  Input (B, T, pose_feats), output
    (B, num_speakers).
    """

    input_channels: int = 96
    num_speakers: int = 4
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        plan = [(self.input_channels, 64, False), (64, 64, True),
                (64, 128, True), (128, 128, True),
                (128, 256, True), (256, 256, True),
                (256, self.num_speakers, True)]
        x = _Conv1DStack(plan, self.p, self.groups, self.dtype,
                         self.param_dtype, name="stack")(x, train)
        return x.mean(axis=1)  # temporal mean → (B, num_speakers)


class TextEncoder1D(nn.Module):
    """(B, T, emb) → (B, T, 256).  Reference layers.py:339-373."""

    output_feats: int = 64
    input_channels: int = 300
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_steps: Optional[int] = None, train: bool = True):
        plan = [(self.input_channels, 64, False), (64, 64, False),
                (64, 128, False), (128, 128, False),
                (128, 256, False), (256, 256, False)]
        return _Conv1DStack(plan, self.p, self.groups, self.dtype,
                            self.param_dtype, name="stack")(x, train)


class AudioEncoder1D(nn.Module):
    """1D audio encoder over (B, T, mel).  Reference layers.py:384-417."""

    output_feats: int = 64
    input_channels: int = 128
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_steps: Optional[int] = None, train: bool = True):
        plan = [(self.input_channels, 64, False), (64, 64, False),
                (64, 128, False), (128, 128, False),
                (128, 256, False), (256, 256, False)]
        return _Conv1DStack(plan, self.p, self.groups, self.dtype,
                            self.param_dtype, name="stack")(x, train)


class LatentEncoder(nn.Module):
    """4-layer 1D conv encoder.  Reference layers.py:424-443."""

    in_channels: int
    hidden_channels: int
    out_channels: int = 2
    p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        plan = [(self.in_channels, self.hidden_channels, False),
                (self.hidden_channels, self.hidden_channels, False),
                (self.hidden_channels, self.hidden_channels, False),
                (self.hidden_channels, self.out_channels, False)]
        return _Conv1DStack(plan, self.p, 1, self.dtype, self.param_dtype,
                            name="stack")(x, train)


class ClusterClassify(nn.Module):
    """(B, T, C) → per-frame cluster logits (B, T, num_clusters).

    Reference layers.py:446-467: 6 ConvNormRelu + 1×1 conv logits.
    """

    num_clusters: int = 8
    input_channels: int = 256
    p: float = 0.0
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        plan = [(self.input_channels, 256, False)] + [(256, 256, False)] * 5
        x = _Conv1DStack(plan, self.p, self.groups, self.dtype,
                         self.param_dtype, name="stack")(x, train)
        x = nn.Conv(features=self.num_clusters * self.groups, kernel_size=(1,),
                    feature_group_count=self.groups, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="logits")(x)
        return x


class _GroupedConv1DEinsum(nn.Module):
    """Stride-1 grouped 1-D conv as unfold + per-group matmul.

    Parameter-compatible with ``nn.Conv(features, kernel_size=(k,),
    feature_group_count=G)`` — same ``kernel`` (k, Cin_pg, features) /
    ``bias`` layout.  XLA's SPMD partitioner compiles a *feature-sharded
    grouped convolution gradient* pathologically (~330 s for ONE conv on the
    8-device CPU mesh vs 0.6 s replicated) and mispartitions the k=1 case
    outright; this dot_general form partitions exactly and instantly, making
    expert-parallel sharding of the mixture decoder practical.
    """

    features: int
    groups: int
    kernel_size: int = 3
    padding: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        G, k = self.groups, self.kernel_size
        cin_pg = x.shape[-1] // G
        F = self.features // G
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, cin_pg, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        B, T = x.shape[0], x.shape[1]
        xp = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        taps = jnp.stack([xp[:, i:i + T, :] for i in range(k)], axis=2)
        xg = taps.reshape(B, T, k, G, cin_pg)
        kg = kernel.reshape(k, cin_pg, G, F)
        y = jnp.einsum("btkgc,kcgf->btgf", xg, kg)
        return y.reshape(B, T, G * F) + bias


class GroupedPointwiseConv(nn.Module):
    """1×1 grouped conv expressed as a per-group matmul (dot_general).

    Math- and parameter-compatible with ``nn.Conv(features=G*F,
    kernel_size=(1,), feature_group_count=G)`` — identical ``kernel``
    (1, Cin_pg, G*F) / ``bias`` (G*F,) params, so checkpoints and the torch
    weight-transfer parity tests are unaffected — but lowered to an einsum,
    which (a) is the natural MXU form of a pointwise conv and (b) sidesteps
    an XLA SPMD mispartitioning: a kernel_size-1 grouped convolution whose
    kernel is sharded on the output-feature axis returns wrong values under
    GSPMD (verified on the 8-device CPU mesh: k=1 grouped conv with
    P(None, None, 'model') kernel is off by O(1); k≥3 is exact).  The
    mixture-decoder output head uses this module so expert-parallel sharding
    (parallel/mesh.py:shard_state_mixture) stays numerically exact.
    """

    features: int
    groups: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        G, F = self.groups, self.features // self.groups
        cin_pg = x.shape[-1] // G
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, cin_pg, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        xg = x.reshape(x.shape[:-1] + (G, cin_pg))
        # conv kernel columns are group-major: column g*F+f multiplies the
        # inputs of group g
        kg = kernel[0].reshape(cin_pg, G, F)
        y = jnp.einsum("...gc,cgf->...gf", xg, kg)
        return y.reshape(x.shape[:-1] + (self.features,)) + bias


class EmbLin(nn.Module):
    """Embedding usable in hard-index ('emb') or soft-matmul ('lin') mode —
    the style table.  Reference layers.py:652-663."""

    num_embeddings: int
    embedding_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "lin"):
        emb = self.param("embedding", nn.initializers.normal(stddev=1.0),
                         (self.num_embeddings, self.embedding_dim), self.param_dtype)
        emb = emb.astype(self.dtype)
        if mode == "lin":
            return x.astype(self.dtype) @ emb
        elif mode == "emb":
            return jnp.take(emb, x, axis=0)
        raise ValueError(f"unknown EmbLin mode {mode!r}")


def curriculum_value(step, start: float, end: float, num_iters: int):
    """Linear 0→1 style curriculum schedule (reference ``Curriculum``,
    layers.py:677-696) as a pure function of the step counter."""
    frac = jnp.clip(step / max(num_iters, 1), 0.0, 1.0)
    return start + (end - start) * frac


def confidence_entropy_loss(y, y_cap, confidence, beta: float = 1.0,
                            epsilon: float = 0.5):
    """Gaussian-entropy confidence-weighted loss (reference ``Confidence``,
    layers.py:469-501)."""
    import math

    def get_sigma(c):
        c = jnp.where(c < epsilon, epsilon, c)
        return 1.0 / (2.0 * math.pi * c)

    sigma = get_sigma(confidence)
    diff = -((y - y_cap) ** 2)
    prob = jnp.exp(diff / (2.0 * sigma ** 2)) / (2.0 * math.pi * sigma)
    sigma_ycap = get_sigma(prob)
    return 0.5 * jnp.log(2.0 * math.pi * math.e * (sigma_ycap ** 2)) * beta


class PoseDecoder(nn.Module):
    """Grouped pose decoder with style re-injection between layers.

    Reference layers.py:291-316: 4 grouped ConvNormRelu layers; after each
    non-final layer the per-group style block (the last ``style_dim`` channels
    of each group) is re-concatenated; grouped 1×1 logits head.
    Input (B, T, num_clusters*(input_channels+style_dim)).
    """

    input_channels: int = 256
    style_dim: int = 10
    num_clusters: int = 8
    out_feats: int = 96
    p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, T, _ = x.shape
        M = self.num_clusters
        common = dict(type="1d", leaky=True, p=self.p, groups=M,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        # per-group trailing style channels (layers.py:308)
        xg = x.reshape(B, T, M, -1)
        style = xg[..., -self.style_dim:]
        for i in range(4):
            x = ConvNormRelu(self.input_channels + self.style_dim,
                             self.input_channels, name=f"dec{i}",
                             **common)(x, train=train)
            if i < 3:
                xg = x.reshape(B, T, M, -1)
                x = jnp.concatenate([xg, style], axis=-1).reshape(B, T, -1)
        x = nn.Conv(self.out_feats * M, kernel_size=(1,),
                    feature_group_count=M, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pose_logits")(x)
        return x


class StyleDecoder(nn.Module):
    """Two grouped ConvNormRelu layers + grouped 1×1 logits
    (reference layers.py:318-335)."""

    input_channels: int = 256
    num_clusters: int = 10
    out_feats: int = 96
    p: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        M = self.num_clusters
        common = dict(type="1d", leaky=True, p=self.p, groups=M,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(2):
            x = ConvNormRelu(self.input_channels, self.input_channels,
                             name=f"dec{i}", **common)(x, train=train)
        return nn.Conv(self.out_feats * M, kernel_size=(1,),
                       feature_group_count=M, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="pose_logits")(x)
