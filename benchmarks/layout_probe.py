"""Probe the params-carry relayout cost (BASELINE.md bisect: ~1.1 ms/step).

When weights are loop constants XLA hoists their layout conversions out of
the scan; when they are carried (training), it re-lays them out every
iteration.  These variants test whether alternative *storage* forms let XLA
pick a fixed-point carry layout that kills the per-iteration transposes:

  V0  baseline: params carried as-is, plain SGD (bisect variant A2)
  V1  conv kernels stored transposed (O, I, k) in the carry, logically
      transposed back to flax's (k, I, O) inside the body
  V2  params carried as ONE flat f32 vector, unraveled inside the body
      (trivial carry layout; update is a single fused elementwise op)
  V3  V2 + hand-fused Adam on the flat vector (optimizer cost probe vs the
      ~0.8 ms optax adam+clip in bisect variant B)

Usage: python benchmarks/layout_probe.py [bf16]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, Path(__file__).resolve().parent.parent.as_posix())

from bench import build, log  # noqa: E402
from benchmarks.profile_train import scan_piece, time_scanned  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from __graft_entry__ import _example_batch
    from mixstage_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from mixstage_tpu.train import losses as L

    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    B = 32
    factory = build(dtype, donate=False)
    cfg = factory.cfg
    mesh = make_mesh()
    batch = _example_batch(B=B)
    if dtype == jnp.bfloat16:
        batch = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(np.asarray(x).dtype, np.floating) else x, batch)
    state = factory.init(jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    batch = shard_batch(batch, mesh)

    def loss_of(g_params, rng):
        pose, internal, _, _ = factory._forward(
            g_params, state.g_state, batch, False, True, False, rng)
        fake_v = factory._d_input(pose, batch["x"])
        d_score, _ = factory._apply_disc(state.d_params, state.d_state,
                                         fake_v, True)
        G_gan = factory.criterion(d_score, jnp.ones_like(d_score)).mean()
        pose_loss = factory.criterion(pose, batch["y"]).mean()
        return pose_loss + G_gan + sum(internal.values())

    rng0 = jax.random.key(1)
    results = {}
    only = [a for a in sys.argv[1:] if a.startswith("v")]

    def want(tag):
        return not only or tag in only

    # ---- V0: baseline params-carried SGD -----------------------------------
    def v0_body(carry):
        g_params, s = carry
        grads = jax.grad(loss_of)(g_params, rng0)
        g_params = jax.tree.map(lambda p, g: p - 1e-4 * g.astype(p.dtype),
                                g_params, grads)
        return (g_params, s + 1)

    results["V0_baseline"] = time_scanned(
        scan_piece(v0_body, None), (state.g_params, jnp.zeros((), jnp.float32)),
        lambda c: c[1])
    log(f"V0 baseline (params carried, SGD): "
        f"{results['V0_baseline'] * 1e3:.3f} ms/iter")

    # ---- V1: kernels stored transposed --------------------------------------
    def store_t(tree):
        def t(p):
            if p.ndim == 3:   # (k, I, O) -> (O, I, k)
                return jnp.transpose(p, (2, 1, 0))
            if p.ndim == 4:   # (kh, kw, I, O) -> (O, I, kh, kw)
                return jnp.transpose(p, (3, 2, 0, 1))
            return p
        return jax.tree.map(t, tree)

    def load_t(tree):
        def t(p):
            if p.ndim == 3:
                return jnp.transpose(p, (2, 1, 0))
            if p.ndim == 4:
                return jnp.transpose(p, (2, 3, 1, 0))
            return p
        return jax.tree.map(t, tree)

    def v1_body(carry):
        g_params_t, s = carry
        grads_t = jax.grad(lambda pt, r: loss_of(load_t(pt), r))(g_params_t,
                                                                 rng0)
        g_params_t = jax.tree.map(lambda p, g: p - 1e-4 * g.astype(p.dtype),
                                  g_params_t, grads_t)
        return (g_params_t, s + 1)

    if want("v1"):
        results["V1_transposed"] = time_scanned(
            scan_piece(v1_body, None),
            (store_t(state.g_params), jnp.zeros((), jnp.float32)), lambda c: c[1])
        log(f"V1 kernels stored (O,I,k): {results['V1_transposed'] * 1e3:.3f} ms/iter")

    # ---- V2: flat-vector carry ----------------------------------------------
    flat0, unravel = ravel_pytree(state.g_params)
    log(f"flat param vector: {flat0.size / 1e6:.2f}M elements")

    def v2_body(carry):
        flat, s = carry
        grads = jax.grad(lambda f, r: loss_of(unravel(f), r))(flat, rng0)
        flat = flat - 1e-4 * grads
        return (flat, s + 1)

    if want("v2"):
        results["V2_flat"] = time_scanned(
            scan_piece(v2_body, None), (flat0, jnp.zeros((), jnp.float32)),
            lambda c: c[1])
        log(f"V2 flat-vector carry: {results['V2_flat'] * 1e3:.3f} ms/iter")

    # ---- V3: flat carry + fused Adam ----------------------------------------
    def v3_body(carry):
        flat, mu, nu, s = carry
        grads = jax.grad(lambda f, r: loss_of(unravel(f), r))(flat, rng0)
        # clip by global norm 1 (reference trainer.py:1138-1146)
        gn = jnp.sqrt((grads * grads).sum())
        grads = grads * jnp.minimum(1.0, 1.0 / (gn + 1e-12))
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4
        t = s + 1
        mu = b1 * mu + (1 - b1) * grads
        nu = b2 * nu + (1 - b2) * grads * grads
        mu_hat = mu / (1 - b1 ** t)
        nu_hat = nu / (1 - b2 ** t)
        flat = flat - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return (flat, mu, nu, t)

    if want("v3"):
        results["V3_flat_adam"] = time_scanned(
            scan_piece(v3_body, None),
            (flat0, jnp.zeros_like(flat0), jnp.zeros_like(flat0),
             jnp.zeros((), jnp.float32)),
            lambda c: c[3])
        log(f"V3 flat + fused adam+clip: {results['V3_flat_adam'] * 1e3:.3f} ms/iter")

    # ---- V4: tree carry + hand-fused adam+clip ------------------------------
    def v4_body(carry):
        params, mu, nu, s = carry
        grads = jax.grad(loss_of)(params, rng0)
        gn = jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum()
                          for g in jax.tree_util.tree_leaves(grads)))
        scale = jnp.minimum(1.0, 1.0 / (gn + 1e-12))
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4
        t = s + 1
        c1 = 1 - b1 ** t
        c2 = 1 - b2 ** t

        def upd(p, g, m, v):
            g = g * scale
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            return (p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps), m, v)

        out = jax.tree.map(upd, params, grads, mu, nu)
        params = jax.tree.map(lambda o: o[0], out,
                              is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        return (params, mu, nu, t)

    if want("v4"):
        zeros = jax.tree.map(jnp.zeros_like, state.g_params)
        results["V4_tree_fused_adam"] = time_scanned(
            scan_piece(v4_body, None),
            (state.g_params, zeros, zeros, jnp.zeros((), jnp.float32)),
            lambda c: c[3])
        log(f"V4 tree carry + fused adam+clip: "
            f"{results['V4_tree_fused_adam'] * 1e3:.3f} ms/iter")

    # ---- V5: tree carry + optax adam+clip (the production optimizer) --------
    import optax

    def v5_body(carry):
        params, opt, s = carry
        grads = jax.grad(loss_of)(params, rng0)
        updates, opt = factory.g_tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, s + 1)

    if want("v5"):
        results["V5_tree_optax_adam"] = time_scanned(
            scan_piece(v5_body, None),
            (state.g_params, factory.g_tx.init(state.g_params),
             jnp.zeros((), jnp.float32)),
            lambda c: c[2])
        log(f"V5 tree carry + optax adam+clip: "
            f"{results['V5_tree_optax_adam'] * 1e3:.3f} ms/iter")

    # ---- V6 (bf16 only): params STORED bf16 in the carry --------------------
    # production bf16 mode keeps f32 params and casts per use; storing bf16
    # halves the bytes the per-iteration carry relayout touches.  SGD in f32
    # on a cast (master-weights stand-in) so update semantics match.
    if dtype == jnp.bfloat16 and want("v6"):
        p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), state.g_params)

        def v6_body(carry):
            params16, s = carry
            grads = jax.grad(lambda p, r: loss_of(p, r))(params16, rng0)
            params16 = jax.tree.map(
                lambda p, g: (p.astype(jnp.float32)
                              - 1e-4 * g.astype(jnp.float32)).astype(p.dtype),
                params16, grads)
            return (params16, s + 1)

        results["V6_bf16_params"] = time_scanned(
            scan_piece(v6_body, None), (p16, jnp.zeros((), jnp.float32)),
            lambda c: c[1])
        log(f"V6 params stored bf16: {results['V6_bf16_params'] * 1e3:.3f} ms/iter")

    log("layout probe (ms/iter): " + " | ".join(
        f"{k} {v * 1e3:.2f}" for k, v in results.items())
        + f" (dtype={jnp.dtype(dtype).name})")
    return results


if __name__ == "__main__":
    main()
