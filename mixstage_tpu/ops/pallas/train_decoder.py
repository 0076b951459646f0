"""Pallas TPU kernels: the Mix-StAGE mixture decoder fwd+bwd for TRAINING.

The serving kernel (`fused_conv.fused_mixstage_decoder`) folds BatchNorm into
the conv weights, which is only valid on running statistics.  Training BN
normalizes with *batch* statistics computed over (B, T) per channel and
updates the running stats — so the training kernel computes the full
conv → BN(train) → leaky chain per mixture group with activations resident
in VMEM, saves the per-layer conv outputs + batch stats as residuals, and a
second Pallas kernel computes the complete backward pass (conv taps, BN
train-mode gradients, leaky) without XLA ever repacking the decoder weights.

Why: `docs/STATUS.md` "Perf analysis" — ~1.1 ms/step of the bs32 training
step is XLA re-laying-out carried weights for fwd/bwd conv kernels every
scan iteration.  Pallas consumes the weights exactly as stored (one stack/
pad gather per step), eliminating the decoder's share of that cost and all
inter-layer HBM round-trips.  Reference semantics of the chain itself:
jlcss4.py:69-83,190-193 (4 grouped ConvNormRelu + grouped 1×1 logits).

Numerics contract: matches the flax path (`models/mix_stage.py` decoder
loop) to bf16 rounding — BN stats are f32 reductions of the bf16 conv
output, normalization math in f32, activations cast back to the compute
dtype — mirroring flax.linen.BatchNorm's force_float32_reductions path.
This is an opt-in fast path (`StepConfig.fused_decoder`), like the serving
kernel; the default flax graph remains the parity-exact path.

Layout (per group g of G):
  x:        (B, T, C0p)  tiled content⊕style features, zero-padded to C0p
  w0:       (G, 3, C0p, C)   layer-0 conv taps (xm, x, xp)
  wc:       (3, G, 3, C, C)  chain conv taps for layers 1..3
  cb:       (G, 4, C)        conv biases
  gamma/beta: (G, 4, C)      BN scale/bias
  w_logits: (G, C, Fp)       grouped 1×1 head, zero-padded to Fp lanes
  b_logits: (G, 1, Fp)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
SLOPE = 0.2
L = 4  # ConvNormRelu layers (1 rectangular + 3 square)

# the bwd kernel keeps ~20 (B·T, C) f32 temporaries + all residuals live per
# grid step at bs32, which exceeds Mosaic's default 16 MiB scoped-vmem stack;
# v5e has 128 MiB VMEM — let the kernels use most of it
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv3_acc(x, w, B, T, cin):
    """3-tap 'same' conv as shifted matmuls; returns f32 (B*T, cout)."""
    xm = jnp.concatenate([jnp.zeros((B, 1, cin), x.dtype), x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], jnp.zeros((B, 1, cin), x.dtype)], axis=1)
    acc = jnp.dot(xm.reshape(B * T, cin), w[0],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x.reshape(B * T, cin), w[1],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(xp.reshape(B * T, cin), w[2],
                   preferred_element_type=jnp.float32)
    return acc


def _fwd_group(x, w0, wc, cb, gamma, beta, wl, bl, *, B, T, C0, C, Fp):
    """Pure forward chain for ONE group (jnp ops only) — the single source
    of the fused forward's float path.  Called from the Pallas kernel on
    VMEM blocks AND from `decoder_train_xla_twin` (the autodiff twin the
    gradient tests differentiate through, so both sides share bit-identical
    kink decisions in the leaky units).  Returns (logits (B,T,Fp),
    cs (L,B,T,C) conv outputs, mu/var (L,C) f32 batch stats)."""
    dt = x.dtype
    h = x
    cs, mus, vrs = [], [], []
    for l in range(L):
        if l == 0:
            acc = _conv3_acc(h, w0, B, T, C0)
        else:
            acc = _conv3_acc(h, wc[l - 1], B, T, C)
        # flax nn.Conv rounds the conv output to the compute dtype BEFORE
        # adding the bias — match that rounding point
        c = acc.astype(dt) + cb[l][None, :]
        cs.append(c.reshape(B, T, C))
        cf = c.astype(jnp.float32)               # f32 stats, like flax BN
        mu = jnp.mean(cf, axis=0)
        var = jnp.mean(cf * cf, axis=0) - mu * mu
        mus.append(mu)
        vrs.append(var)
        xhat = (cf - mu[None, :]) * jax.lax.rsqrt(var + EPS)[None, :]
        pre = (xhat * gamma[l].astype(jnp.float32)[None, :]
               + beta[l].astype(jnp.float32)[None, :])
        # leaky in f32 then cast: v5e Mosaic rejects bf16 vector compares
        h = jnp.where(pre >= 0, pre, SLOPE * pre).astype(dt).reshape(B, T, C)
    logits = jnp.dot(h.reshape(B * T, C), wl,
                     preferred_element_type=jnp.float32)
    logits += bl[0][None, :]
    return (logits.reshape(B, T, Fp).astype(dt), jnp.stack(cs),
            jnp.stack(mus), jnp.stack(vrs))


def _fwd_kernel(x_ref, w0_ref, wc_ref, cb_ref, g_ref, b_ref, wl_ref, bl_ref,
                o_ref, cs_ref, mu_ref, var_ref, *, B, T, C0, C, Fp):
    """Forward chain for one group; saves conv outputs + batch stats."""
    out, cs, mu, var = _fwd_group(
        x_ref[...], w0_ref[0], wc_ref[:, 0], cb_ref[0], g_ref[0], b_ref[0],
        wl_ref[0], bl_ref[0], B=B, T=T, C0=C0, C=C, Fp=Fp)
    o_ref[0] = out
    cs_ref[:, 0] = cs
    mu_ref[0] = mu
    var_ref[0] = var


def _fwd_call(x, w0, wc, cb, gamma, beta, wl, bl, *, interpret=False):
    B, T, C0 = x.shape
    G = w0.shape[0]
    C = w0.shape[-1]
    Fp = wl.shape[-1]
    kernel = functools.partial(_fwd_kernel, B=B, T=T, C0=C0, C=C, Fp=Fp)
    grid = (G,)
    out, cs, mu, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, T, C0), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C0, C), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, 3, C, C), lambda g: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Fp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, T, Fp), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, T, C), lambda g: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, B, T, Fp), x.dtype),
            jax.ShapeDtypeStruct((L, G, B, T, C), x.dtype),
            jax.ShapeDtypeStruct((G, L, C), jnp.float32),
            jax.ShapeDtypeStruct((G, L, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x, w0, wc, cb, gamma, beta, wl, bl)
    return out, cs, mu, var


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(do_ref, x_ref, cs_ref, mu_ref, var_ref,
                w0_ref, wc_ref, g_ref, wl_ref,
                dx_ref, dw0_ref, dwc_ref, dcb_ref, dg_ref, db_ref,
                dwl_ref, dbl_ref, *, B, T, C0, C, Fp):
    """Backward chain for one group.  dx accumulates across grid steps
    (group-tiled input shares one gradient block)."""
    dt = x_ref.dtype
    N = B * T

    # g_ref carries [gamma; beta] stacked on axis 1 (see _bwd_call packing)
    gamma = g_ref[0, :L]
    beta = g_ref[0, L:]

    # ---- logits head: recompute h3 from the saved conv output + stats ----
    cf = cs_ref[L - 1].reshape(N, C).astype(jnp.float32)
    xhat3 = ((cf - mu_ref[0, L - 1][None, :])
             * jax.lax.rsqrt(var_ref[0, L - 1] + EPS)[None, :])
    pre3 = (xhat3 * gamma[L - 1].astype(jnp.float32)[None, :]
            + beta[L - 1].astype(jnp.float32)[None, :])
    h3f = jnp.where(pre3 >= 0, pre3, SLOPE * pre3)
    h3 = h3f.astype(dt)
    do = do_ref[0].reshape(N, Fp)
    dwl_ref[0] = jnp.dot(h3.T, do,
                         preferred_element_type=jnp.float32).astype(
                             dwl_ref.dtype)
    dbl_ref[0, 0] = jnp.sum(do.astype(jnp.float32), axis=0).astype(
        dbl_ref.dtype)
    dh = jnp.dot(do, wl_ref[0].T,
                 preferred_element_type=jnp.float32)        # (N, C) f32

    # ---- chain layers, walking back ----
    for l in range(L - 1, -1, -1):
        cf = cs_ref[l].reshape(N, C).astype(jnp.float32)
        inv = jax.lax.rsqrt(var_ref[0, l] + EPS)
        xhat = (cf - mu_ref[0, l][None, :]) * inv[None, :]
        pre = (xhat * gamma[l].astype(jnp.float32)[None, :]
               + beta[l].astype(jnp.float32)[None, :])
        dpre = jnp.where(pre >= 0, dh, SLOPE * dh)          # leaky'
        dg_ref[0, l] = jnp.sum(dpre * xhat, axis=0).astype(dg_ref.dtype)
        db_ref[0, l] = jnp.sum(dpre, axis=0).astype(db_ref.dtype)
        dxhat = dpre * gamma[l].astype(jnp.float32)[None, :]
        # BN train backward (biased batch var):
        dc = inv[None, :] * (dxhat
                             - jnp.mean(dxhat, axis=0)[None, :]
                             - xhat * jnp.mean(dxhat * xhat, axis=0)[None, :])
        dcb_ref[0, l] = jnp.sum(dc, axis=0).astype(dcb_ref.dtype)
        dc = dc.astype(dt)                                  # feed MXU in dt
        dc3 = dc.reshape(B, T, C)

        # layer input (recomputed): x for l=0, h_{l-1} otherwise
        if l == 0:
            inp = x_ref[...]
            cin = C0
        else:
            cfp = cs_ref[l - 1].reshape(N, C).astype(jnp.float32)
            xhp = ((cfp - mu_ref[0, l - 1][None, :])
                   * jax.lax.rsqrt(var_ref[0, l - 1] + EPS)[None, :])
            prep = (xhp * gamma[l - 1].astype(jnp.float32)[None, :]
                    + beta[l - 1].astype(jnp.float32)[None, :])
            inp = jnp.where(prep >= 0, prep, SLOPE * prep).astype(dt) \
                .reshape(B, T, C)
            cin = C
        im = jnp.concatenate([jnp.zeros((B, 1, cin), dt), inp[:, :-1]],
                             axis=1).reshape(N, cin)
        i0 = inp.reshape(N, cin)
        ip = jnp.concatenate([inp[:, 1:], jnp.zeros((B, 1, cin), dt)],
                             axis=1).reshape(N, cin)
        dcf = dc  # (N, C) in dt
        dW = jnp.stack([
            jnp.dot(im.T, dcf, preferred_element_type=jnp.float32),
            jnp.dot(i0.T, dcf, preferred_element_type=jnp.float32),
            jnp.dot(ip.T, dcf, preferred_element_type=jnp.float32)], axis=0)
        if l == 0:
            dw0_ref[0] = dW.astype(dw0_ref.dtype)
            w = w0_ref[0]
        else:
            dwc_ref[l - 1, 0] = dW.astype(dwc_ref.dtype)
            w = wc_ref[l - 1, 0]
        # d(input) = xpshift(dc @ W0^T) + dc @ W1^T + xmshift(dc @ W2^T)
        u0 = jnp.dot(dcf, w[0].T, preferred_element_type=jnp.float32) \
            .reshape(B, T, cin)
        u1 = jnp.dot(dcf, w[1].T, preferred_element_type=jnp.float32) \
            .reshape(B, T, cin)
        u2 = jnp.dot(dcf, w[2].T, preferred_element_type=jnp.float32) \
            .reshape(B, T, cin)
        dinp = (u1
                + jnp.concatenate([u0[:, 1:],
                                   jnp.zeros((B, 1, cin), u0.dtype)], axis=1)
                + jnp.concatenate([jnp.zeros((B, 1, cin), u2.dtype),
                                   u2[:, :-1]], axis=1))
        if l == 0:
            # accumulate the group-tiled input grad across grid steps
            @pl.when(pl.program_id(0) == 0)
            def _init():
                dx_ref[...] = dinp.astype(dx_ref.dtype)

            @pl.when(pl.program_id(0) != 0)
            def _acc():
                dx_ref[...] += dinp.astype(dx_ref.dtype)
        else:
            dh = dinp.reshape(N, cin)


def _bwd_call(do, x, cs, mu, var, w0, wc, gamma_beta, wl, *, interpret=False):
    B, T, C0 = x.shape
    G = w0.shape[0]
    C = w0.shape[-1]
    Fp = wl.shape[-1]
    kernel = functools.partial(_bwd_kernel, B=B, T=T, C0=C0, C=C, Fp=Fp)
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, B, T, Fp), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T, C0), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, T, C), lambda g: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C0, C), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, 3, C, C), lambda g: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Fp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, T, C0), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C0, C), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, 3, C, C), lambda g: (0, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Fp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C0), f32),        # dx (summed over G)
            jax.ShapeDtypeStruct((G, 3, C0, C), f32),     # dw0
            jax.ShapeDtypeStruct((3, G, 3, C, C), f32),   # dwc
            jax.ShapeDtypeStruct((G, L, C), f32),         # d conv bias
            jax.ShapeDtypeStruct((G, L, C), f32),         # d gamma
            jax.ShapeDtypeStruct((G, L, C), f32),         # d beta
            jax.ShapeDtypeStruct((G, C, Fp), f32),        # d w_logits
            jax.ShapeDtypeStruct((G, 1, Fp), f32),        # d b_logits
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(do, x, cs, mu, var, w0, wc, gamma_beta, wl)
    return out


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def decoder_train(x, w0, wc, cb, gamma, beta, wl, bl, interpret=False):
    """Fused training decoder: returns (logits (G,B,T,Fp), mu, var).

    mu/var are the f32 per-layer batch stats (G, L, C) the caller uses for
    the BatchNorm running-stat update (flax semantics:
    ra = 0.9*ra + 0.1*batch, biased batch var).
    """
    out, _cs, mu, var = _fwd_call(x, w0, wc, cb, gamma, beta, wl, bl,
                                  interpret=interpret)
    return out, mu, var


def _decoder_train_fwd(x, w0, wc, cb, gamma, beta, wl, bl, interpret):
    out, cs, mu, var = _fwd_call(x, w0, wc, cb, gamma, beta, wl, bl,
                                 interpret=interpret)
    return (out, mu, var), (x, cs, mu, var, w0, wc, gamma, beta, wl)


def _decoder_train_bwd(interpret, res, cts):
    do, _dmu, _dvar = cts  # stats get zero cotangents (stop-gradient by use)
    x, cs, mu, var, w0, wc, gamma, beta, wl = res
    gb = jnp.concatenate([gamma, beta], axis=1)  # (G, 2L, C)
    do = do.astype(x.dtype)
    dx, dw0, dwc, dcb, dg, db, dwl, dbl = _bwd_call(
        do, x, cs, mu, var, w0, wc, gb, wl, interpret=interpret)
    dt = x.dtype
    return (dx.astype(dt), dw0.astype(w0.dtype), dwc.astype(wc.dtype),
            dcb.astype(dt), dg.astype(gamma.dtype), db.astype(beta.dtype),
            dwl.astype(wl.dtype), dbl.astype(dt))


decoder_train.defvjp(_decoder_train_fwd, _decoder_train_bwd)


def decoder_train_xla_twin(x, w0, wc, cb, gamma, beta, wl, bl):
    """Plain-XLA twin of `decoder_train` built from the SAME per-group pure
    function the kernel executes (`_fwd_group`), so its float path — and in
    particular every leaky-ReLU kink decision — is identical to the fused
    kernel's.  Differentiating through this twin gives the ground-truth
    gradients the custom-vjp backward kernel is tested against
    (tests/test_train_decoder.py); comparing against the conv-based
    `decoder_train_reference` instead is only value-stable, not
    subgradient-stable (a single pre≈0 element picks different branches)."""
    B, T, C0 = x.shape
    G, _, _, C = w0.shape
    Fp = wl.shape[-1]
    outs, mus, vrs = [], [], []
    for g in range(G):
        out, _cs, mu, var = _fwd_group(
            x, w0[g], wc[:, g], cb[g], gamma[g], beta[g], wl[g], bl[g],
            B=B, T=T, C0=C0, C=C, Fp=Fp)
        outs.append(out)
        mus.append(mu)
        vrs.append(var)
    return jnp.stack(outs), jnp.stack(mus), jnp.stack(vrs)


# ---------------------------------------------------------------------------
# parameter packing + public entry
# ---------------------------------------------------------------------------


def extract_train_decoder(gen_params, num_clusters: int):
    """Stack/pad the flax decoder params into the kernel layout (differentiable
    gather — autodiff routes kernel grads back to the original tree)."""
    G = num_clusters
    layers = sorted([k for k in gen_params if k.startswith("decoder")],
                    key=lambda s: int(s.replace("decoder", "")))
    assert len(layers) == L, layers
    k0 = gen_params[layers[0]]["conv"]["kernel"]      # (3, C0, G*C)
    _, C0, GC = k0.shape
    C = GC // G
    C0p = _round_up(C0, 128)
    w0 = jnp.stack([jnp.pad(k0[:, :, g * C:(g + 1) * C],
                            ((0, 0), (0, C0p - C0), (0, 0)))
                    for g in range(G)])               # (G, 3, C0p, C)
    wc = jnp.stack([
        jnp.stack([gen_params[name]["conv"]["kernel"][:, :,
                                                      g * C:(g + 1) * C]
                   for g in range(G)])
        for name in layers[1:]])                      # (3, G, 3, C, C)
    cb = jnp.stack([
        jnp.stack([gen_params[name]["conv"]["bias"].reshape(G, C)[g]
                   for name in layers])
        for g in range(G)])                           # (G, 4, C)
    gamma = jnp.stack([
        jnp.stack([gen_params[name]["norm"]["scale"].reshape(G, C)[g]
                   for name in layers]) for g in range(G)])
    beta = jnp.stack([
        jnp.stack([gen_params[name]["norm"]["bias"].reshape(G, C)[g]
                   for name in layers]) for g in range(G)])
    lk = gen_params["logits"]["kernel"]               # (G, C, F) or (1,C,G*F)
    if lk.ndim == 3 and lk.shape[0] == G:
        wl_g = lk
    else:
        F = lk.shape[-1] // G
        wl_g = jnp.stack([lk[0, :, g * F:(g + 1) * F] for g in range(G)])
    F = wl_g.shape[-1]
    Fp = _round_up(F, 128)
    wl = jnp.pad(wl_g, ((0, 0), (0, 0), (0, Fp - F)))
    lb = gen_params["logits"].get("bias")
    if lb is None:
        bl = jnp.zeros((G, 1, Fp), lk.dtype)
    else:
        bl_g = lb.reshape(G, F) if lb.ndim == 1 else lb
        bl = jnp.pad(bl_g, ((0, 0), (0, Fp - F)))[:, None, :]
    return {"w0": w0, "wc": wc, "cb": cb, "gamma": gamma, "beta": beta,
            "wl": wl, "bl": bl, "c0": C0, "out_feats": F}


def fused_decoder_train(x, gen_params, num_clusters: int, dtype=None,
                        interpret: Optional[bool] = None):
    """Run the fused training decoder on tiled features.

    Args:
      x: (B, T, C0) the shared content⊕style features (UNTILED — each group
        sees the same input, so tiling happens implicitly in the kernel).
      gen_params: the generator's flax param tree (["decoder0".."decoder3"],
        ["logits"]).
    Returns:
      xr: (B, T, G*F) per-group pose logits (combine with
        index_select_outputs), and
      stats: list of L (mean, var) f32 pairs, concatenated over groups in
        flax layout (G*C,), for the BatchNorm running-stat update.
    """
    if interpret is None:  # Mosaic on TPU, interpreter everywhere else
        interpret = jax.default_backend() != "tpu"
    p = extract_train_decoder(gen_params, num_clusters)
    B, T, C0 = x.shape
    C0p = p["w0"].shape[2]
    G = num_clusters
    F = p["out_feats"]
    if dtype is not None:
        x = x.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, C0p - C0)))
    cast = (lambda a: a.astype(x.dtype))
    out, mu, var = decoder_train(
        xp, cast(p["w0"]), cast(p["wc"]), cast(p["cb"]), cast(p["gamma"]),
        cast(p["beta"]), cast(p["wl"]), cast(p["bl"]), interpret)
    xr = jnp.transpose(out[..., :F], (1, 2, 0, 3)).reshape(B, T, G * F)
    # (G, L, C) -> per-layer (G*C,) in flax's grouped-channel order
    stats = [(mu[:, l].reshape(G * (mu.shape[-1])),
              var[:, l].reshape(G * (var.shape[-1])))
             for l in range(L)]
    return xr, stats


def decoder_train_reference(x, gen_params, num_clusters: int):
    """XLA reference of the same training chain (parity tests): replicates
    the flax decoder loop (tile → 4×[grouped conv3 → BN(train) → leaky] →
    grouped 1×1) and returns (xr, stats) like fused_decoder_train."""
    G = num_clusters
    layers = sorted([k for k in gen_params if k.startswith("decoder")],
                    key=lambda s: int(s.replace("decoder", "")))
    h = jnp.tile(x, (1, 1, G))
    stats = []
    for name in layers:
        k = gen_params[name]["conv"]["kernel"]
        b = gen_params[name]["conv"]["bias"]
        c = jax.lax.conv_general_dilated(
            h, k, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=G) + b[None, None, :]
        cf = c.astype(jnp.float32)
        mu = cf.mean(axis=(0, 1))
        var = (cf * cf).mean(axis=(0, 1)) - mu * mu
        stats.append((mu, var))
        xhat = (cf - mu) * jax.lax.rsqrt(var + EPS)
        g = gen_params[name]["norm"]["scale"].astype(jnp.float32)
        be = gen_params[name]["norm"]["bias"].astype(jnp.float32)
        pre = (xhat * g + be).astype(c.dtype)
        h = jnp.where(pre >= 0, pre, SLOPE * pre)
    lk = gen_params["logits"]["kernel"]
    lb = gen_params["logits"].get("bias")
    if lk.ndim == 3 and lk.shape[0] == G:
        B, T, _ = h.shape
        C = lk.shape[1]
        hg = h.reshape(B, T, G, C)
        xr = jnp.einsum("btgc,gcf->btgf", hg, lk).reshape(B, T, -1)
    else:
        xr = jax.lax.conv_general_dilated(
            h, lk, (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=G)
    if lb is not None:
        xr = xr + lb.reshape(-1)[None, None, :]
    return xr, stats
