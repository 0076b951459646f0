"""Decompose Mix-StAGE training-step time on the TPU.

Times (differential chain timing, see bench.py) the pieces of the G step so
perf work targets the real bottleneck:

  fwd            eval-mode generator forward (style path)
  fwd+bwd        value_and_grad of the G loss, no optimizer
  optimizer      adam update + apply on frozen grads
  g_step         full per-step G update
  scan16         fused 16-step driver, per-step

Usage:  python benchmarks/profile_train.py [bf16]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, Path(__file__).resolve().parent.parent.as_posix())

from bench import build, chain_time, fetch, marginal_time, flops_of, log  # noqa: E402


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

    # ---- fwd only ----------------------------------------------------------
    @jax.jit
    def fwd(state, batch):
        pose, losses, _, _ = factory._style_forward(
            state.g_params, state.g_state, batch, False, False, False,
            jax.random.key(0))
        return pose.sum().astype(jnp.float32)

    def fwd_chain(n):
        out = None
        for _ in range(n):
            out = fwd(state, batch)
        return out

    fwd_chain(1)
    t_fwd = marginal_time(fwd_chain, n=32)
    log(f"fwd (eval-mode): {t_fwd * 1e3:.3f} ms  "
        f"[{(flops_of(fwd, state, batch) or 0) / 1e9:.1f} GFLOP]")

    # ---- fwd in train mode (BN stat updates) -------------------------------
    @jax.jit
    def fwd_train(state, batch):
        pose, losses, new_state, _ = factory._style_forward(
            state.g_params, state.g_state, batch, False, True, False,
            jax.random.key(0))
        return pose.sum().astype(jnp.float32)

    def fwdt_chain(n):
        out = None
        for _ in range(n):
            out = fwd_train(state, batch)
        return out

    fwdt_chain(1)
    t_fwdt = marginal_time(fwdt_chain, n=32)
    log(f"fwd (train-mode): {t_fwdt * 1e3:.3f} ms")

    # ---- fwd+bwd, no optimizer ---------------------------------------------
    @jax.jit
    def fwd_bwd(state, batch, rng):
        def loss_fn(g_params):
            pose, internal, g_state, _ = factory._style_forward(
                g_params, state.g_state, batch, False, True, False, rng)
            fake_v = pose[:, 1:] - pose[:, :-1]
            pose_loss = jnp.abs(pose - batch["y"]).mean()
            return pose_loss + sum(internal.values()), pose

        (loss, pose), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params)
        return sum(jnp.sum(jnp.abs(g)) for g in
                   jax.tree_util.tree_leaves(grads)).astype(jnp.float32)

    def bwd_chain(n):
        out = None
        for _ in range(n):
            out = fwd_bwd(state, batch, jax.random.key(0))
        return out

    bwd_chain(1)
    t_bwd = marginal_time(bwd_chain, n=24)
    log(f"fwd+bwd (no D, no optim): {t_bwd * 1e3:.3f} ms  "
        f"[{(flops_of(fwd_bwd, state, batch, jax.random.key(0)) or 0) / 1e9:.1f} GFLOP]")

    # ---- optimizer only -----------------------------------------------------
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, state.g_params)

    @jax.jit
    def opt_only(opt_state, params, grads):
        updates, opt_state = factory.g_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return opt_state, params, sum(
            jnp.sum(jnp.abs(p)) for p in
            jax.tree_util.tree_leaves(params)).astype(jnp.float32)

    holder = {"o": state.g_opt_state, "p": state.g_params}

    def opt_chain(n):
        out = None
        for _ in range(n):
            holder["o"], holder["p"], out = opt_only(holder["o"], holder["p"],
                                                     grads)
        return out

    opt_chain(1)
    t_opt = marginal_time(opt_chain, n=32)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.g_params))
    log(f"optimizer (adam+clip apply): {t_opt * 1e3:.3f} ms  "
        f"[{n_params / 1e6:.1f}M params]")

    # ---- full steps ----------------------------------------------------------
    steps = factory.make_steps()
    st = {"s": state}

    def g_chain(n):
        out = None
        for i in range(n):
            st["s"], losses, _ = steps["g"](st["s"], batch, jax.random.key(i),
                                            use_pose_input=False)
            out = losses["total"]
        return out

    g_chain(1)
    t_g = marginal_time(g_chain, n=16)
    log(f"g_step (full): {t_g * 1e3:.3f} ms")

    def d_chain(n):
        out = None
        for i in range(n):
            st["s"], losses, _ = steps["d"](st["s"], batch, jax.random.key(i),
                                            use_pose_input=False)
            out = losses["total"]
        return out

    d_chain(1)
    t_d = marginal_time(d_chain, n=16)
    log(f"d_step (full): {t_d * 1e3:.3f} ms")

    from bench import bench_scan

    scan_sec, _, _ = bench_scan(factory, B, 16)
    log(f"scan16 per-step: {scan_sec * 1e3:.3f} ms")
    log(f"decomposition: fwd {t_fwd * 1e3:.2f} | fwd_train {t_fwdt * 1e3:.2f} "
        f"| +bwd {t_bwd * 1e3:.2f} | optim {t_opt * 1e3:.2f} "
        f"| g {t_g * 1e3:.2f} | d {t_d * 1e3:.2f} "
        f"| scan {scan_sec * 1e3:.2f} (dtype={dtype.__name__})")


if __name__ == "__main__":
    main()
