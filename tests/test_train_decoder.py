"""Parity tests for the fused TRAINING decoder (ops/pallas/train_decoder).

The serving kernel folds BN on running stats; training BN normalizes with
batch statistics and must backprop through them.  These tests pin the fused
fwd+bwd custom-vjp kernel (interpret mode on CPU; the Mosaic-compiled path
is covered by the tpu-marked test + /tmp smoke) against an XLA re-derivation
of the exact flax decoder chain — forward, batch stats, and gradients w.r.t.
the input and every parameter.  Reference semantics: jlcss4.py:69-83,190-193.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixstage_tpu.ops.pallas.train_decoder import (decoder_train_reference,
                                                   fused_decoder_train)

G, C, C0, F = 2, 128, 138, 96
B, T = 2, 16


def _params(rng, dtype=jnp.float32):
    def a(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype)

    p = {}
    for i in range(4):
        cin = C0 if i == 0 else C
        p[f"decoder{i}"] = {
            "conv": {"kernel": a(3, cin, G * C), "bias": a(G * C, scale=0.1)},
            "norm": {"scale": a(G * C, scale=1.0) + 1.0,
                     "bias": a(G * C, scale=0.1)}}
    p["logits"] = {"kernel": a(G, C, F), "bias": a(G * F, scale=0.1)}
    return p


def test_train_decoder_forward_and_stats_match_reference():
    rng = np.random.default_rng(0)
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(B, T, C0)), jnp.float32)

    xr_f, stats_f = fused_decoder_train(x, params, G, interpret=True)
    xr_r, stats_r = decoder_train_reference(x, params, G)

    np.testing.assert_allclose(np.asarray(xr_f), np.asarray(xr_r),
                               rtol=1e-4, atol=1e-4)
    assert len(stats_f) == len(stats_r) == 4
    for (mu_f, var_f), (mu_r, var_r) in zip(stats_f, stats_r):
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_r),
                                   rtol=1e-4, atol=1e-5)


def test_train_decoder_gradients_match_autodiff_twin():
    """Full backward parity: d loss / d {x, every packed decoder param} of
    the fused custom-vjp kernel vs XLA autodiff through
    `decoder_train_xla_twin` — which runs the SAME per-group pure function
    as the kernel, so the leaky-ReLU kink decisions are bit-identical and
    the comparison is subgradient-stable (the conv-based reference rounds
    pre-activations differently; a single pre≈0 element flipping branches
    legitimately shifts grads by ~10% — measured, round 3)."""
    from mixstage_tpu.ops.pallas.train_decoder import (EPS, _fwd_group,
                                                       decoder_train,
                                                       decoder_train_xla_twin,
                                                       extract_train_decoder)

    # seed 5 keeps every pre-activation ≥1.6e-5 from the kink (scanned),
    # ~10× the measured interpret-vs-plain float drift, so no element can
    # flip branches between the two implementations
    rng = np.random.default_rng(5)
    params = _params(rng)
    x = jnp.asarray(rng.normal(size=(B, T, C0)), jnp.float32)
    p = extract_train_decoder(params, G)
    C0p = p["w0"].shape[2]
    Fp = p["wl"].shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, C0p - C0)))
    cot = jnp.asarray(rng.normal(size=(G, B, T, Fp)), jnp.float32)
    args = (xp, p["w0"], p["wc"], p["cb"], p["gamma"], p["beta"],
            p["wl"], p["bl"])

    min_abs_pre = 1e9
    for g in range(G):
        _o, cs_t, mu_t, var_t = _fwd_group(
            xp, p["w0"][g], p["wc"][:, g], p["cb"][g], p["gamma"][g],
            p["beta"][g], p["wl"][g], p["bl"][g],
            B=B, T=T, C0=C0p, C=C, Fp=Fp)
        for layer in range(4):
            ct = cs_t[layer].reshape(B * T, C).astype(jnp.float32)
            pre = ((ct - mu_t[layer]) * jax.lax.rsqrt(var_t[layer] + EPS)
                   * p["gamma"][g, layer] + p["beta"][g, layer])
            min_abs_pre = min(min_abs_pre, float(jnp.abs(pre).min()))
    assert min_abs_pre > 5e-6, (
        f"test draw has a pre-activation {min_abs_pre:.1e} from the leaky "
        f"kink — pick a different seed (subgradient comparison unsafe)")

    def loss_fused(*a):
        out, _mu, _var = decoder_train(*a, True)
        return jnp.sum(out * cot)

    def loss_twin(*a):
        out, _mu, _var = decoder_train_xla_twin(*a)
        return jnp.sum(out * cot)

    names = ["x", "w0", "wc", "cb", "gamma", "beta", "wl", "bl"]
    lf, gf = jax.value_and_grad(loss_fused, argnums=tuple(range(8)))(*args)
    lt, gt = jax.value_and_grad(loss_twin, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(lf), float(lt), rtol=1e-5)
    for name, a, b in zip(names, gf, gt):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        if name == "cb":
            # d(conv bias) ≡ 0 analytically under train-mode BN (the batch-
            # mean subtraction cancels any constant shift) — both sides are
            # float noise, so compare absolutely
            assert np.abs(a).max() < 1e-4 and np.abs(b).max() < 1e-4
            continue
        scale = np.abs(b).mean() + 1e-8
        err = np.abs(a - b).max()
        assert err / scale < 1e-3, f"grad mismatch at {name}: {err / scale:.2e}"


@pytest.mark.slow
def test_fused_g_step_matches_flax_g_step():
    """StepConfig(fused_decoder=True): one full jitted Adam G-step (backbone
    as flax + decoder as the fused kernel) must match the default flax graph
    — losses, pose, updated params, and BN running stats."""
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=4, num_speakers=2)
    cfgF = StepConfig(**{**cfg.__dict__, "fused_decoder": True})
    f0, f1 = StepFactory(cfg, donate=False), StepFactory(cfgF, donate=False)

    rng = np.random.default_rng(2)
    Bs, Ts = 2, 64
    batch = {
        "x": (jnp.asarray(rng.normal(size=(Bs, Ts, 128)), jnp.float32),),
        "y": jnp.asarray(rng.normal(size=(Bs, Ts, 96)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 4, size=(Bs, Ts))),
        "style": jnp.asarray(np.zeros((Bs, Ts)), jnp.int32),
    }
    state = f0.init(jax.random.key(0), batch)
    s0, l0, p0 = f0.make_steps()["g"](state, batch, jax.random.key(1),
                                      use_pose_input=False)
    s1, l1, p1 = f1.make_steps()["g"](state, batch, jax.random.key(1),
                                      use_pose_input=False)

    np.testing.assert_allclose(float(l1["total"]), float(l0["total"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-3, atol=1e-4)
    for tree0, tree1, what, tol in ((s0.g_params, s1.g_params, "param", 5e-4),
                                    (s0.g_state, s1.g_state, "bn-stat", 5e-4)):
        flat0, treedef0 = jax.tree_util.tree_flatten_with_path(tree0)
        flat1, treedef1 = jax.tree.flatten(tree1)
        assert treedef0.num_leaves == treedef1.num_leaves
        for (kp, leaf0), leaf1 in zip(flat0, flat1):
            err = np.abs(np.asarray(leaf1, np.float64)
                         - np.asarray(leaf0, np.float64)).max()
            assert err < tol, (f"{what} divergence at "
                               f"{jax.tree_util.keystr(kp)}: {err:.2e}")


@pytest.mark.tpu
def test_fused_g_step_on_tpu_within_drift_budget():
    """Mosaic-compiled fused bf16 G-step on the real chip, judged against
    f32 TRUTH: the fused kernel's pose drift from the f32 flax step must
    not exceed the flax bf16 step's own drift by more than 10% — i.e. the
    kernel is as accurate a bf16 rounding of the true computation as flax
    itself (measured round 3: 5.0273% fused vs 5.0279% flax; their mutual
    1.98% gap is two equally-valid bf16 roundings, so comparing fused
    directly to flax-bf16 would mis-score the kernel).
    Run: MIXSTAGE_TPU_TESTS=1 python -m pytest tests/ -m tpu -q"""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_batch
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    common = dict(model="JointLateClusterSoftStyle4_G", gan=True,
                  criterion="L1Loss", num_clusters=8, num_speakers=8)
    cfg32 = StepConfig(**common)
    cfg16 = StepConfig(**common, dtype=jnp.bfloat16)
    cfg16F = StepConfig(**common, dtype=jnp.bfloat16, fused_decoder=True)
    batch = _example_batch(B=32)
    f32f, f16f, f16F = (StepFactory(c, donate=False)
                        for c in (cfg32, cfg16, cfg16F))
    state = f32f.init(jax.random.key(0), batch)
    poses = {}
    for name, f in [("f32", f32f), ("bf16_flax", f16f),
                    ("bf16_fused", f16F)]:
        _, losses, pose = f.make_steps()["g"](state, batch,
                                              jax.random.key(1),
                                              use_pose_input=False)
        assert np.isfinite(float(losses["total"])), name
        poses[name] = np.asarray(pose, np.float64)
    truth = poses["f32"]
    scale = np.abs(truth).mean() + 1e-9
    drift_flax = np.abs(poses["bf16_flax"] - truth).mean() / scale
    drift_fused = np.abs(poses["bf16_fused"] - truth).mean() / scale
    assert drift_fused <= drift_flax * 1.10 + 1e-3, (
        f"fused kernel drifts {drift_fused:.4%} from f32 truth vs flax "
        f"bf16's {drift_flax:.4%} — kernel numerics regressed")
