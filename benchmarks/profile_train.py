"""Decompose Mix-StAGE training-step time on the TPU.

Per-call dispatch through this container's device tunnel costs ~6-10 ms, so
per-call timing cannot decompose a ~3.6 ms step.  Instead each piece is
wrapped in a ``lax.scan`` of K iterations inside ONE dispatch (with the
batch perturbed by the carry so XLA cannot hoist loop-invariant work), and
the per-iteration device time is the differential chain time divided by K.

Pieces:
  fwd            eval-mode generator forward (style path)
  fwd_train      train-mode forward (BN batch stats computed)
  fwd+bwd        value_and_grad of the G loss, no optimizer
  optimizer      adam+clip update/apply on frozen grads
  g_full         full G step (forward+backward+D-in-train+optimizer)
  scan16         the production fused driver (G/D coin mix)

Usage:  python benchmarks/profile_train.py [bf16]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, Path(__file__).resolve().parent.parent.as_posix())

from bench import build, marginal_time, log  # noqa: E402

K = 16


def scan_piece(body_fn, init_carry, jit_kwargs=None):
    """One-dispatch K-iteration scan of body_fn(carry) -> carry."""
    import jax

    def scanned(carry):
        def step(c, _):
            return body_fn(c), None

        out, _ = jax.lax.scan(step, carry, None, length=K)
        return out

    return jax.jit(scanned, **(jit_kwargs or {}))


def time_scanned(scanned, init_carry, scalar_of, chain=6):
    """Marginal seconds per *iteration*: chain scanned dispatches, divide by K."""
    holder = {"c": init_carry}

    def run_chain(n):
        for _ in range(n):
            holder["c"] = scanned(holder["c"])
        return scalar_of(holder["c"])

    run_chain(1)  # compile
    return marginal_time(run_chain, n=chain) / K


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _example_batch
    from mixstage_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    B = 32
    factory = build(dtype, donate=False)
    mesh = make_mesh()
    batch = _example_batch(B=B)
    if dtype == jnp.bfloat16:
        batch = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(np.asarray(x).dtype, np.floating) else x, batch)
    state = factory.init(jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    batch = shard_batch(batch, mesh)
    eps = jnp.asarray(1e-6, batch["y"].dtype)

    def perturbed(batch, s):
        # tie the inputs to the carry so the loop body cannot be hoisted
        return {**batch,
                "x": tuple(x + (s * eps).astype(x.dtype) for x in batch["x"]),
                "y": batch["y"] + (s * eps).astype(batch["y"].dtype)}

    results = {}

    # ---- fwd (eval mode) ----------------------------------------------------
    def fwd_body(c):
        s = c
        pose, _, _, _ = factory._style_forward(
            state.g_params, state.g_state, perturbed(batch, s), False, False,
            False, jax.random.key(0))
        return (pose.mean() * 0 + s + 1).astype(jnp.float32)

    results["fwd_eval"] = time_scanned(scan_piece(fwd_body, None),
                                       jnp.zeros((), jnp.float32), lambda c: c)
    log(f"fwd (eval-mode): {results['fwd_eval'] * 1e3:.3f} ms/iter")

    # ---- fwd (train mode: batch stats) ---------------------------------------
    def fwdt_body(c):
        s = c
        pose, _, _, _ = factory._style_forward(
            state.g_params, state.g_state, perturbed(batch, s), False, True,
            False, jax.random.key(0))
        return (pose.mean() * 0 + s + 1).astype(jnp.float32)

    results["fwd_train"] = time_scanned(scan_piece(fwdt_body, None),
                                        jnp.zeros((), jnp.float32),
                                        lambda c: c)
    log(f"fwd (train-mode): {results['fwd_train'] * 1e3:.3f} ms/iter")

    # ---- fwd+bwd, no optimizer ------------------------------------------------
    def bwd_body(c):
        s = c

        def loss_fn(g_params):
            pose, internal, _, _ = factory._style_forward(
                g_params, state.g_state, perturbed(batch, s), False, True,
                False, jax.random.key(0))
            return jnp.abs(pose - batch["y"]).mean() + sum(internal.values())

        g = jax.grad(loss_fn)(state.g_params)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return (leaf.ravel()[0] * 0 + s + 1).astype(jnp.float32)

    results["fwd_bwd"] = time_scanned(scan_piece(bwd_body, None),
                                      jnp.zeros((), jnp.float32), lambda c: c)
    log(f"fwd+bwd (no optim): {results['fwd_bwd'] * 1e3:.3f} ms/iter")

    # ---- discriminator cost (the G_gan term) ----------------------------------
    from mixstage_tpu.train import losses as L

    pose0 = batch["y"]

    def dfwd_body(c):
        s = c
        v = L.velocity(pose0 + (s * eps).astype(pose0.dtype))
        score, _ = factory._apply_disc(state.d_params, state.d_state, v, True)
        return (score.mean() * 0 + s + 1).astype(jnp.float32)

    results["d_fwd_train"] = time_scanned(scan_piece(dfwd_body, None),
                                          jnp.zeros((), jnp.float32),
                                          lambda c: c)
    log(f"D fwd (train-mode): {results['d_fwd_train'] * 1e3:.3f} ms/iter")

    def dbwd_body(c):
        s = c

        def gan_term(pose):
            v = L.velocity(pose)
            score, _ = factory._apply_disc(state.d_params, state.d_state, v,
                                           True)
            return factory.criterion(score, jnp.ones_like(score)).mean()

        g = jax.grad(gan_term)(pose0 + (s * eps).astype(pose0.dtype))
        return (g.ravel()[0] * 0 + s + 1).astype(jnp.float32)

    results["d_fwd_bwd"] = time_scanned(scan_piece(dbwd_body, None),
                                        jnp.zeros((), jnp.float32),
                                        lambda c: c)
    log(f"D fwd+bwd wrt pose: {results['d_fwd_bwd'] * 1e3:.3f} ms/iter")

    # ---- full G loss incl G_gan (no optimizer) ---------------------------------
    def bwdgan_body(c):
        s = c

        def loss_fn(g_params):
            pose, internal, _, _ = factory._style_forward(
                g_params, state.g_state, perturbed(batch, s), False, True,
                False, jax.random.key(0))
            v = L.velocity(pose)
            score, _ = factory._apply_disc(state.d_params, state.d_state, v,
                                           True)
            G_gan = factory.criterion(score, jnp.ones_like(score)).mean()
            return (jnp.abs(pose - batch["y"]).mean() + G_gan
                    + sum(internal.values()))

        g = jax.grad(loss_fn)(state.g_params)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return (leaf.ravel()[0] * 0 + s + 1).astype(jnp.float32)

    results["fwd_bwd_gan"] = time_scanned(scan_piece(bwdgan_body, None),
                                          jnp.zeros((), jnp.float32),
                                          lambda c: c)
    log(f"fwd+bwd incl G_gan (no optim): "
        f"{results['fwd_bwd_gan'] * 1e3:.3f} ms/iter")

    # ---- optimizer only ---------------------------------------------------------
    grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, state.g_params)

    def opt_body(c):
        opt_state, params = c
        updates, opt_state = factory.g_tx.update(grads0, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (opt_state, params)

    def opt_scalar(c):
        return jax.tree_util.tree_leaves(c[1])[0].ravel()[0]

    results["optimizer"] = time_scanned(
        scan_piece(opt_body, None), (state.g_opt_state, state.g_params),
        opt_scalar)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.g_params))
    log(f"optimizer (adam+clip): {results['optimizer'] * 1e3:.3f} ms/iter "
        f"[{n_params / 1e6:.1f}M params]")

    # ---- full G step (scan of _g_step) ------------------------------------------
    def g_body(st):
        st, _, _ = factory._g_step(st, batch, jax.random.key(1),
                                   use_pose_input=False)
        return st

    results["g_full"] = time_scanned(scan_piece(g_body, None), state,
                                     lambda st: jax.tree_util.tree_leaves(
                                         st.g_params)[0].ravel()[0])
    log(f"g_step scanned: {results['g_full'] * 1e3:.3f} ms/iter")

    def d_body(st):
        st, _, _ = factory._d_step(st, batch, jax.random.key(1),
                                   use_pose_input=False)
        return st

    results["d_full"] = time_scanned(scan_piece(d_body, None), state,
                                     lambda st: jax.tree_util.tree_leaves(
                                         st.d_params)[0].ravel()[0])
    log(f"d_step scanned: {results['d_full'] * 1e3:.3f} ms/iter")

    from bench import bench_scan

    scan_sec, _, _ = bench_scan(factory, B, 16)
    log(f"scan16 (prod driver, G/D mix): {scan_sec * 1e3:.3f} ms/step")
    log("decomposition (ms/iter): " + " | ".join(
        f"{k} {v * 1e3:.2f}" for k, v in results.items())
        + f" | prod {scan_sec * 1e3:.2f} (dtype={jnp.dtype(dtype).name})")


if __name__ == "__main__":
    main()
