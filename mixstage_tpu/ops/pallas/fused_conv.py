"""Pallas TPU kernel: fused grouped Conv1d(+folded BN)+LeakyReLU chains.

The hot op of Mix-StAGE is the mixture decoder — 4 grouped Conv1d(k=3) layers
at M×256 channels (reference jlcss4.py:69-83), each followed by BatchNorm and
LeakyReLU.  On the serving path BatchNorm runs on running statistics, so it
folds into the conv weights (``fold_bn_into_conv``); the chain then becomes
L layers of (grouped conv → leaky-relu).

Key structural insight: the chain is *group-separable* — grouped convs are
block-diagonal, so mixture component g's activations never mix with other
groups across ALL layers.  The kernel therefore puts (group, batch-tile) on
the Pallas grid: each program runs the entire L-layer chain for one group's
channel block with activations resident in VMEM (zero intermediate HBM
round-trips), and because the group index is the *major* grid dimension the
weight block (L, 3, C, C) is fetched once per group and reused across batch
tiles by the pipeline.

Convolution is expressed as 3 shifted matmuls so the MXU sees
(B_tile*T, C) @ (C, C) contractions.

Layout: x (B, T, G*C); weights (L, G, 3, C, C); bias (L, G*C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_into_conv(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var,
                      eps: float = 1e-5):
    """Fold inference-mode BatchNorm into the preceding conv.

    kernel: (..., Cout); bias: (Cout,) or None.
    Returns (kernel', bias') with conv(x, k') + b' == BN(conv(x, k) + b).
    """
    inv_std = bn_scale / jnp.sqrt(bn_var + eps)
    kernel = kernel * inv_std  # broadcasts over the trailing Cout axis
    if bias is None:
        bias = jnp.zeros_like(bn_bias)
    bias = (bias - bn_mean) * inv_std + bn_bias
    return kernel, bias


def _chain_kernel(x_ref, w_ref, b_ref, o_ref, *, L, C, T, Bt, negative_slope):
    """Full L-layer chain for one (group, batch-tile) block.

    x_ref: (Bt, T, C); w_ref: (L, 1, 3, C, C); b_ref: (1, L, C);
    o_ref: (Bt, T, C).
    """
    x = x_ref[...]
    for l in range(L):  # static unroll
        xm = jnp.concatenate([jnp.zeros((Bt, 1, C), x.dtype),
                              x[:, :-1, :]], axis=1)
        xp = jnp.concatenate([x[:, 1:, :],
                              jnp.zeros((Bt, 1, C), x.dtype)], axis=1)
        acc = jnp.dot(xm.reshape(Bt * T, C), w_ref[l, 0, 0],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x.reshape(Bt * T, C), w_ref[l, 0, 1],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xp.reshape(Bt * T, C), w_ref[l, 0, 2],
                            preferred_element_type=jnp.float32)
        acc = acc + b_ref[0, l][None, :]
        y = jnp.where(acc >= 0, acc, negative_slope * acc)
        x = y.reshape(Bt, T, C).astype(x_ref.dtype)
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("groups", "negative_slope",
                                             "batch_tile", "interpret"))
def fused_grouped_conv_chain(x, weights, biases, groups: int,
                             negative_slope: float = 0.2,
                             batch_tile: int = 16,
                             interpret: bool = False):
    """L-layer fused grouped conv(k3,'same')+bias+leaky chain.

    Args:
      x: (B, T, G*C) activations.
      weights: (L, G, 3, C, C) folded conv kernels (tap, in, out).
      biases: (L, G*C) folded biases.
      groups: G.
    Returns (B, T, G*C).
    """
    B, T, GC = x.shape
    L, G, K, C, C2 = weights.shape
    assert G == groups and K == 3 and C == C2 and G * C == GC, \
        (weights.shape, x.shape, groups)
    Bt = min(batch_tile, B)
    while B % Bt:
        Bt -= 1

    kernel = functools.partial(_chain_kernel, L=L, C=C, T=T, Bt=Bt,
                               negative_slope=negative_slope)
    biases_g = jnp.transpose(biases.reshape(L, G, C), (1, 0, 2))
    return pl.pallas_call(
        kernel,
        # group-major grid: the weight block is revisited across batch tiles
        grid=(G, B // Bt),
        in_specs=[
            pl.BlockSpec((Bt, T, C), lambda g, i: (i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 3, C, C), lambda g, i: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, T, C), lambda g, i: (i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, GC), x.dtype),
        interpret=interpret,
    )(x, weights, biases_g)


def chain_reference(x, weights, biases, groups: int,
                    negative_slope: float = 0.2):
    """XLA reference implementation of the same chain (parity tests + CPU
    fallback path)."""
    L, G, K, C, _ = weights.shape
    for l in range(L):
        outs = []
        for g in range(G):
            xg = x[:, :, g * C:(g + 1) * C]
            yg = jax.lax.conv_general_dilated(
                xg, weights[l, g], window_strides=(1,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            outs.append(yg)
        y = jnp.concatenate(outs, axis=-1) + biases[l][None, None, :]
        x = jnp.where(y >= 0, y, negative_slope * y)
    return x


# ---------------------------------------------------------------------------
# Full mixture-decoder kernel: layer0 (rectangular) + chain + 1x1 logits
# ---------------------------------------------------------------------------


def _decoder_kernel(x_ref, w0_ref, wc_ref, b_ref, wl_ref, bl_ref, o_ref,
                    *, L, C0, C, F, T, Bt, negative_slope):
    """Entire mixture decoder for one (group, batch-tile) block.

    x_ref:  (Bt, T, C0)        shared content+style features (padded)
    w0_ref: (1, 3, C0, C)      layer-0 folded kernel for this group
    wc_ref: (L, 1, 3, C, C)    chain folded kernels
    b_ref:  (1, L + 1, C)      folded biases (layer0 at row 0)
    wl_ref: (1, C, F)          1x1 logits kernel
    bl_ref: (1, 1, F)          logits bias (padded to 2D block)
    o_ref:  (Bt, T, F)         this group's pose logits
    """
    def conv3(xv, w, bias, cin, cout):
        xm = jnp.concatenate([jnp.zeros((Bt, 1, cin), xv.dtype),
                              xv[:, :-1, :]], axis=1)
        xp = jnp.concatenate([xv[:, 1:, :],
                              jnp.zeros((Bt, 1, cin), xv.dtype)], axis=1)
        acc = jnp.dot(xm.reshape(Bt * T, cin), w[0],
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xv.reshape(Bt * T, cin), w[1],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xp.reshape(Bt * T, cin), w[2],
                            preferred_element_type=jnp.float32)
        acc = acc + bias[None, :]
        y = jnp.where(acc >= 0, acc, negative_slope * acc)
        return y.reshape(Bt, T, cout).astype(xv.dtype)

    x = conv3(x_ref[...], w0_ref[0], b_ref[0, 0], C0, C)
    for l in range(L):
        x = conv3(x, wc_ref[l, 0], b_ref[0, l + 1], C, C)
    logits = jnp.dot(x.reshape(Bt * T, C), wl_ref[0],
                     preferred_element_type=jnp.float32)
    logits = logits + bl_ref[0, 0][None, :]
    o_ref[0] = logits.reshape(Bt, T, F).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "negative_slope",
                                             "batch_tile", "interpret"))
def fused_mixstage_decoder(x, w0, wc, biases, w_logits, b_logits, groups: int,
                           negative_slope: float = 0.2, batch_tile: int = 16,
                           interpret: bool = False):
    """The whole Mix-StAGE mixture decoder as one Pallas kernel.

    Args:
      x: (B, T, C0) shared content⊕style features (pad C0 to a multiple of
        128 with zeros before calling; pad w0's input dim to match).
      w0: (G, 3, C0, C) folded layer-0 kernels.
      wc: (L, G, 3, C, C) folded chain kernels.
      biases: (G, L + 1, C) folded biases (row 0 = layer 0).
      w_logits: (G, C, F); b_logits: (G, F) — the grouped 1x1 output conv.
    Returns per-group pose logits (B, T, G*F); combine with
    ``index_select_outputs`` outside.
    """
    B, T, C0 = x.shape
    L, G, _, C, _ = wc.shape
    F = w_logits.shape[-1]
    Bt = min(batch_tile, B)
    while B % Bt:
        Bt -= 1
    kernel = functools.partial(_decoder_kernel, L=L, C0=C0, C=C, F=F, T=T,
                               Bt=Bt, negative_slope=negative_slope)
    b_logits2 = b_logits[:, None, :]  # (G, 1, F)
    out = pl.pallas_call(
        kernel,
        grid=(G, B // Bt),
        in_specs=[
            pl.BlockSpec((Bt, T, C0), lambda g, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C0, C), lambda g, i: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 3, C, C), lambda g, i: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L + 1, C), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, F), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # F (=96) is not lane-aligned, so outputs are laid out (G, B, T, F)
        # — the block's last two dims (T, F) match the array dims — and
        # transposed to the (B, T, G*F) contract afterwards (fuses into the
        # consumer's mixture select).
        out_specs=pl.BlockSpec((1, Bt, T, F), lambda g, i: (g, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, B, T, F), x.dtype),
        interpret=interpret,
    )(x, w0, wc, biases, w_logits, b_logits2)
    return jnp.transpose(out, (1, 2, 0, 3)).reshape(B, T, G * F)
