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


def num_powers_of_two(x: int) -> int:
    """Largest k with 2^k | x (reference layers.py:16-24; used by the UNet
    depth assertion)."""
    k = 0
    while x > 1 and x % 2 == 0:
        x //= 2
        k += 1
    return k


def next_multiple_power_of_two(x: int, power: int = 5) -> int:
    """Scale ``x`` up until 2^power divides it (reference layers.py:26-30)."""
    k = num_powers_of_two(x)
    return x * (2 ** (power - k)) if k < power else x


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
        elif self.lowering == "s2d":
            # exact space-to-depth relowering of the k4s2 downsample conv
            # (TPU lane-padding fix — see _Conv2DS2DFold)
            assert self.type == "2d" and ks == (4, 4) and st == (2, 2) \
                and pad == [(1, 1), (1, 1)], \
                "s2d lowering covers the k4 s2 pad1 2-d downsample conv"
            x = _Conv2DS2DFold(features=features, groups=self.groups,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="conv")(x)
        elif self.lowering == "im2col":
            # exact patches-matmul relowering of a stride-1 2-d conv
            # (small-C / small-spatial TPU fix — see _Conv2DIm2col)
            assert self.type == "2d" and st == (1, 1), \
                "im2col lowering covers stride-1 2-d convs"
            x = _Conv2DIm2col(features=features, groups=self.groups,
                              kernel_size=ks, padding=tuple(pad),
                              dtype=self.dtype, param_dtype=self.param_dtype,
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


# Best measured plan on TPU v5e (benchmarks/audio_lowering_sweep.py): the
# NATIVE lax convs — both exact-math relowerings lose (s2d +72%: the
# activation space-to-depth shuffle and its transposed-grad cost more HBM
# traffic than the lane padding they remove; im2col +13%: kh·kw-fold
# activation duplication).  'tpu' therefore resolves to None; the explicit
# plans remain as a measured knob for other shapes/generations.
AUDIO_LOWERING_TPU: Optional[Tuple[str, ...]] = None


def resolve_audio_lowerings(spec) -> Optional[Tuple[str, ...]]:
    """Translate the -audio_lowering flag into an AudioEncoder plan.

    'native'/None → native lax convs; 'tpu' → the best plan measured on the
    current TPU generation (AUDIO_LOWERING_TPU — native on v5e, see sweep);
    otherwise an explicit 8-entry comma list of conv|s2d|im2col.  All plans
    are exact-math and parameter-compatible (see _Conv2DS2DFold /
    _Conv2DIm2col), so this is purely a performance knob — checkpoints and
    parity are unaffected.
    """
    if spec is None or (isinstance(spec, str) and spec in ("", "native", "conv")):
        return None
    if spec == "tpu":
        return AUDIO_LOWERING_TPU
    if isinstance(spec, str):
        spec = tuple(s.strip() for s in spec.split(","))
    plan = tuple(spec)
    if len(plan) != 8 or not all(p in ("conv", "s2d", "im2col") for p in plan):
        raise ValueError(
            f"audio_lowering must be 'native', 'tpu', or 8 comma-separated "
            f"entries from conv|s2d|im2col; got {spec!r}")
    return plan


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
    # per-layer conv lowering plan for conv0..conv7: each entry 'conv'
    # (native lax conv), 's2d' (k4s2 space-to-depth fold) or 'im2col'
    # (patches matmul) — exact-math TPU relowerings, same params either way
    # (see _Conv2DS2DFold/_Conv2DIm2col).  None = all native.
    lowerings: Optional[Tuple[str, ...]] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _lowering(self, i: int, x, down: bool) -> str:
        lo = "conv" if self.lowerings is None else self.lowerings[i]
        # shape-safe fallbacks (the sampling path feeds arbitrary bucketed
        # lengths; the relowered forms need even / large-enough dims)
        if lo == "s2d" and (x.shape[1] % 2 or x.shape[2] % 2 or not down):
            return "conv"
        if lo == "im2col" and down:
            return "conv"
        return lo

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
            x = ConvNormRelu(cin, cout, downsample=down, name=f"conv{i}",
                             lowering=self._lowering(i, x, down),
                             **common)(x, train)
        x = ConvNormRelu(256, 256, kernel_size=(3, 8), stride=1, name="conv7",
                         lowering=self._lowering(7, x, False), **common)(x, train)
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


class _Conv2DS2DFold(nn.Module):
    """k4 s2 pad1 2-D downsample conv, relowered exactly as
    pad(1) → space-to-depth(2×2) → k2 s1 VALID conv with block-folded weights.

    Parameter-compatible with ``nn.Conv(features, kernel_size=(4,4),
    strides=(2,2), padding=1, feature_group_count=G)`` — identical ``kernel``
    (4, 4, Cin_pg, features) / ``bias`` params, so checkpoints and the torch
    weight-transfer parity tests are unaffected.

    Derivation (per spatial dim): the stride-2 tap x[2t-1+k], k∈0..3, lives at
    slot s=k%2 of space-to-depth pair z[t+k//2] built from the 1-padded input
    (z[u][s] = x[2u+s-1]), so reshaping each kernel 4-axis into
    (tap=k//2, slot=k%2) and folding slots into channels leaves the
    contraction bit-identical (zero padding included).

    Why: the native conv's input minor dim is C (= 64/128 in the audio
    pyramid), which pads half the v5e vector lanes; the folded conv's input
    minor dim is 4·C ≥ 256 so the MXU sees full 128-lane tiles (the lever
    identified by benchmarks/trace_profile.py for reference layers.py:159-199
    conv pyramid's strided stages).
    """

    features: int
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        assert T % 2 == 0 and F % 2 == 0, "s2d fold needs even spatial dims"
        G = self.groups
        cpg = C // G
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, cpg, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        To, Fo = T // 2 + 1, F // 2 + 1
        xp = xp.reshape(B, To, 2, Fo, 2, G, cpg)
        # channel fold is group-major (g, slot_t, slot_f, c) so
        # feature_group_count still sees contiguous per-group channels
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, To, Fo, G * 4 * cpg)
        w = kernel.reshape(2, 2, 2, 2, cpg, self.features)  # (kt,st,kf,sf,c,o)
        w = w.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cpg, self.features)
        y = jax.lax.conv_general_dilated(
            xp, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G)
        return y + bias


class _Conv2DIm2col(nn.Module):
    """Stride-1 2-D conv relowered exactly as shifted-patch concat + matmul.

    Parameter-compatible with ``nn.Conv(features, kernel_size=(kh,kw),
    padding=(ph,pw), feature_group_count=G)``.  The kh·kw shifted views of
    the zero-padded input are concatenated on the channel axis and contracted
    against the flattened kernel in one dot — the natural MXU form when the
    native conv's channel dim is tiny (audio conv0, Cin=1: 9-channel patches
    @ (9, 64) matmul instead of a C=1 lane-starved convolution) or when the
    spatial extent is too small for XLA to tile well (audio conv6/conv7 at
    8×16; reference layers.py:159-199).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))
    groups: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        kh, kw = self.kernel_size
        (pt0, pt1), (pf0, pf1) = self.padding
        G = self.groups
        cpg = C // G
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cpg, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        xp = jnp.pad(x, ((0, 0), (pt0, pt1), (pf0, pf1), (0, 0)))
        To = T + pt0 + pt1 - kh + 1
        Fo = F + pf0 + pf1 - kw + 1
        taps = jnp.stack([xp[:, dt:dt + To, df:df + Fo, :]
                          for dt in range(kh) for df in range(kw)], axis=3)
        if G == 1:
            patches = taps.reshape(B, To, Fo, kh * kw * C)
            y = patches @ kernel.reshape(kh * kw * C, self.features)
        else:
            xg = taps.reshape(B, To, Fo, kh * kw, G, cpg)
            kg = kernel.reshape(kh * kw, cpg, G, self.features // G)
            y = jnp.einsum("btfkgc,kcgo->btfgo", xg, kg)
            y = y.reshape(B, To, Fo, self.features)
        return y + bias


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
