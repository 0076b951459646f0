"""Bisect the gap between the hand-rolled G loss microbench (~1.75 ms) and
the real ``_g_step`` (~3.8 ms) by scanning exact-copy variants.

Variants:
  A  exact _g_step loss_fn (value_and_grad has_aux incl. states) - optimizer
  B  A + optimizer update/apply, carrying (params, opt, g_state, d_state)
  C  factory._g_step verbatim (TrainState carry)

Usage: python benchmarks/bisect_gstep.py [bf16]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, Path(__file__).resolve().parent.parent.as_posix())

from bench import build, log  # noqa: E402
from benchmarks.profile_train import scan_piece, time_scanned, K  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

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

    def exact_loss_grad(g_params, g_state, d_params, d_state, rng, lam):
        """Verbatim copy of _g_step's loss_fn + value_and_grad."""
        y = batch["y"]
        W = jnp.ones((y.shape[0],), cfg.dtype)

        def loss_fn(g_params):
            pose, internal, g_state2, aux = factory._forward(
                g_params, g_state, batch, False, True, False, rng)
            fake_v = factory._d_input(pose, batch["x"])
            d_score, d_state2 = factory._apply_disc(d_params, d_state,
                                                    fake_v, True)
            G_gan = lam * L.sample_wise_weight_mean(
                factory.criterion(d_score, jnp.ones_like(d_score)), 1.0 / W)
            pose_loss = L.sample_wise_weight_mean(
                factory.criterion(pose, y), 1.0 / W)
            conf_loss = factory._confidence_loss(batch, y, pose)
            total = pose_loss + G_gan + conf_loss + sum(internal.values())
            return total, (pose, internal, g_state2, d_state2, pose_loss,
                           G_gan)

        return jax.value_and_grad(loss_fn, has_aux=True)(g_params)

    # ---- variant A: loss+grad only, small carry ------------------------------
    def a_body(c):
        s = c
        rng = jax.random.fold_in(jax.random.key(1), 0)
        (total, aux), grads = exact_loss_grad(
            state.g_params, state.g_state, state.d_params, state.d_state,
            rng, L.lambda_schedule(s.astype(jnp.int32), cfg.lambda_gan))
        leaf = jax.tree_util.tree_leaves(grads)[0]
        return (leaf.ravel()[0] * 0 + s + 1).astype(jnp.float32)

    t_a = time_scanned(scan_piece(a_body, None), jnp.zeros((), jnp.float32),
                       lambda c: c)
    log(f"A exact loss+grad (const params): {t_a * 1e3:.3f} ms/iter")

    # ---- variant A2: like A but params threaded through the carry ------------
    def a2_body(carry):
        g_params, s = carry
        rng = jax.random.fold_in(jax.random.key(1), 0)
        (total, aux), grads = exact_loss_grad(
            g_params, state.g_state, state.d_params, state.d_state, rng,
            cfg.lambda_gan)
        g_params = jax.tree.map(lambda p, g: p - 1e-4 * g.astype(p.dtype),
                                g_params, grads)
        return (g_params, s + 1)

    t_a2 = time_scanned(scan_piece(a2_body, None),
                        (state.g_params, jnp.zeros((), jnp.float32)),
                        lambda c: c[1])
    log(f"A2 loss+grad+sgd (params carried): {t_a2 * 1e3:.3f} ms/iter")

    # ---- variant B: + real optimizer + states carried -------------------------
    def b_body(carry):
        g_params, g_opt, g_state, d_state, s = carry
        rng = jax.random.fold_in(jax.random.key(1), 0)

        def loss_fn(g_params):
            pose, internal, g_state2, aux = factory._forward(
                g_params, g_state, batch, False, True, False, rng)
            fake_v = factory._d_input(pose, batch["x"])
            d_score, d_state2 = factory._apply_disc(state.d_params, d_state,
                                                    fake_v, True)
            W = jnp.ones((pose.shape[0],), cfg.dtype)
            G_gan = L.sample_wise_weight_mean(
                factory.criterion(d_score, jnp.ones_like(d_score)), 1.0 / W)
            pose_loss = L.sample_wise_weight_mean(
                factory.criterion(pose, batch["y"]), 1.0 / W)
            total = pose_loss + G_gan + sum(internal.values())
            return total, (g_state2, d_state2)

        (total, (g_state, d_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_params)
        updates, g_opt = factory.g_tx.update(grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, updates)
        return (g_params, g_opt, g_state, d_state, s + 1)

    t_b = time_scanned(scan_piece(b_body, None),
                       (state.g_params, state.g_opt_state, state.g_state,
                        state.d_state, jnp.zeros((), jnp.float32)),
                       lambda c: c[-1])
    log(f"B loss+grad+adam+states carried: {t_b * 1e3:.3f} ms/iter")

    # ---- variant C: factory._g_step verbatim ----------------------------------
    def c_body(st):
        st, _, _ = factory._g_step(st, batch, jax.random.key(1),
                                   use_pose_input=False)
        return st

    t_c = time_scanned(scan_piece(c_body, None), state,
                       lambda st: jax.tree_util.tree_leaves(
                           st.g_params)[0].ravel()[0])
    log(f"C factory._g_step verbatim: {t_c * 1e3:.3f} ms/iter")
    log(f"bisect: A {t_a * 1e3:.2f} | A2 {t_a2 * 1e3:.2f} | B {t_b * 1e3:.2f} "
        f"| C {t_c * 1e3:.2f} (dtype={jnp.dtype(dtype).name})")


if __name__ == "__main__":
    main()
