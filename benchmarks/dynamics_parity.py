"""Multi-step training-dynamics comparison vs the PyTorch reference.

Two experiments, both starting from IDENTICAL weights on a fixed batch:

* **g_only** — N deterministic Mix-StAGE G-steps (the round-1 evidence):
  torch reference loop (L1 pose + λ(t)·L1 GAN term + internal losses, Adam,
  grad-clip 1) vs this framework's actual jitted ``g_step``;
* **gan_mix** — N steps with an interleaved D/G coin pattern (D every 3rd
  step), exercising the full adversarial runtime on both sides: the D branch
  runs G in eval mode (running BN stats, no updates — gan.py:106-110), D's
  batch stats update from fake-then-real in reference order (gan.py:121-127),
  both optimizers step with grad-clip 1 (trainer.py:1138-1146), and the λ
  ramp advances every step regardless of branch (gan.py:103).

Both sides update batch-norm running stats and Adam moments every step, so
matching loss curves demonstrate matched *training dynamics*, not just a
matched forward.  Writes benchmarks/dynamics_parity.json.

Usage: python benchmarks/dynamics_parity.py [--steps 20]
(CPU; forces jax_platforms=cpu.)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

T, MEL, FEATS, M, S, B = 64, 128, 96, 4, 3, 4


def setup():
    """Build reference torch models + our StepFactory state with identical
    weights/BN stats; returns everything both loops need."""
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
    from test_torch_parity import (_load_ref, copy_cnr, randomize_bn_stats,
                                   t2j_conv1d)

    from mixstage_tpu.train.steps import StepConfig, StepFactory

    torch.manual_seed(0)
    ref_jl = _load_ref("joint_late_cluster_soft_style")
    ref_s2g = _load_ref("speech2gesture")

    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    tG = ref_jl.JointLateClusterSoftStyle4_G(
        time_steps=T, out_feats=FEATS, num_clusters=M,
        style_dict={f"sp{i}": i for i in range(S)}, shape=shape).float().train(True)
    tD = ref_s2g.Speech2Gesture_D(in_channels=FEATS).float().train(True)
    randomize_bn_stats(tG)
    randomize_bn_stats(tD, seed=9)
    tG.thresh.value = 1.0
    tG.thresh.iters = tG.thresh.num_iters  # force the audio branch

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=M, num_speakers=S,
                     lr=1e-4)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(5)
    audio = rng.normal(size=(B, T, MEL)).astype(np.float32)
    y = rng.normal(size=(B, T, FEATS)).astype(np.float32)
    labels = rng.integers(0, M, size=(B, T))
    style_ids = np.repeat(rng.integers(0, S, size=(B, 1)), T, 1)
    batch = {"x": (jnp.asarray(audio),), "y": jnp.asarray(y),
             "labels": jnp.asarray(labels, jnp.int32),
             "style": jnp.asarray(style_ids, jnp.int32)}

    state = factory.init(jax.random.key(0), batch)
    gp = jax.tree.map(np.asarray, state.g_params)
    gs = jax.tree.map(np.asarray, state.g_state)
    dp = jax.tree.map(np.asarray, state.d_params)
    ds = jax.tree.map(np.asarray, state.d_state)
    p, s = gp["gen"], gs["gen"]
    for i in range(8):
        copy_cnr(tG.audio_encoder.conv[i], p["audio_encoder"][f"conv{i}"],
                 s["audio_encoder"][f"conv{i}"])
    copy_cnr(tG.unet.pre_downsampling_conv[0], p["unet"]["pre0"], s["unet"]["pre0"])
    copy_cnr(tG.unet.pre_downsampling_conv[1], p["unet"]["pre1"], s["unet"]["pre1"])
    for i in range(5):
        copy_cnr(tG.unet.conv1[i], p["unet"][f"down{i}"], s["unet"][f"down{i}"])
        copy_cnr(tG.unet.conv2[i], p["unet"][f"up{i}"], s["unet"][f"up{i}"])
    p["style_emb"]["embedding"] = jnp.asarray(tG.style_emb.emb.weight.detach().numpy().copy())
    for i in range(6):
        copy_cnr(tG.classify_cluster.conv[i],
                 p["classify_cluster"]["stack"][f"conv{i}"],
                 s["classify_cluster"]["stack"][f"conv{i}"])
    p["classify_cluster"]["logits"]["kernel"] = t2j_conv1d(tG.classify_cluster.logits.weight)
    p["classify_cluster"]["logits"]["bias"] = jnp.asarray(
        tG.classify_cluster.logits.bias.detach().numpy().copy())
    for i in range(4):
        copy_cnr(tG.decoder[i], p[f"decoder{i}"], s[f"decoder{i}"])
    p["logits"]["kernel"] = t2j_conv1d(tG.logits.weight)
    p["logits"]["bias"] = jnp.asarray(tG.logits.bias.detach().numpy().copy())
    for i in range(7):
        copy_cnr(tG.pose_style_encoder.conv[i], gp["psenc"]["stack"][f"conv{i}"],
                 gs["psenc"]["stack"][f"conv{i}"])
    dp["conv1"]["kernel"] = t2j_conv1d(tD.conv1[0].weight)
    dp["conv1"]["bias"] = jnp.asarray(tD.conv1[0].bias.detach().numpy().copy())
    copy_cnr(tD.conv2[0], dp["conv2_0"], ds["conv2_0"])
    copy_cnr(tD.conv3, dp["conv3"], ds["conv3"])
    dp["logits"]["kernel"] = t2j_conv1d(tD.logits.weight)
    dp["logits"]["bias"] = jnp.asarray(tD.logits.bias.detach().numpy().copy())
    state = state.replace(g_params=gp, g_state=gs, d_params=dp, d_state=ds)
    return factory, state, batch, tG, tD, audio, y, labels, style_ids


def run_torch(tG, tD, audio, y, labels, style_ids, coins):
    """Reference-semantics training loop over a D/G coin sequence
    (gan.py:105-152 + optimize, trainer.py:1138-1146)."""
    import torch

    from mixstage_tpu.train.losses import lambda_schedule

    kwargs = dict(input_modalities=["audio/log_mel_512"],
                  style=torch.from_numpy(style_ids).long(), sample_flag=0,
                  description="train", epoch=0)
    ta, tl, ty = (torch.from_numpy(audio), torch.from_numpy(labels).long(),
                  torch.from_numpy(y))
    g_optim = torch.optim.Adam(tG.parameters(), lr=1e-4)
    d_optim = torch.optim.Adam(tD.parameters(), lr=1e-4)
    L1 = torch.nn.functional.l1_loss

    def vel(x):
        xv = x[..., 1:, :] - x[..., :-1, :]
        return torch.cat([torch.zeros_like(x[..., 0:1, :]), xv], dim=-2)

    losses = []
    for step, coin_d in enumerate(coins):
        lam = float(lambda_schedule(step, 1.0))
        if coin_d:  # D branch (gan.py:105-132)
            d_optim.zero_grad()
            tG.eval()
            with torch.no_grad():
                y_cap, internal = tG([ta, tl], ty, **kwargs)
            tG.train(True)
            # fake score BEFORE real score — D BN-stat update order matters
            fake_score, _ = tD(vel(y_cap).detach())
            fake_D = lam * L1(fake_score, torch.zeros_like(fake_score))
            real_score, _ = tD(vel(ty))
            real_D = L1(real_score, torch.ones_like(real_score))
            loss = real_D + fake_D + sum(internal)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tD.parameters(), 1)
            d_optim.step()
        else:  # G branch (gan.py:134-152)
            g_optim.zero_grad()
            y_cap, internal = tG([ta, tl], ty, **kwargs)
            score, _ = tD(vel(y_cap))
            loss = (L1(y_cap, ty) + lam * L1(score, torch.ones_like(score))
                    + sum(internal))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tG.parameters(), 1)
            g_optim.step()
        losses.append(float(loss))
    return losses


def run_jax(factory, state, batch, coins):
    """This framework's actual jitted g/d steps over the same coin sequence."""
    import jax

    jsteps = factory.make_steps()
    losses = []
    for step, coin_d in enumerate(coins):
        fn = jsteps["d"] if coin_d else jsteps["g"]
        state, out, _ = fn(state, batch, jax.random.key(step),
                           use_pose_input=False)
        losses.append(float(out["total"]))
    return losses


def _end_state_quality(factory, state, batch, y):
    """PCK + spatialNorm of the trained model's forward on the fixed batch
    (the dev-selection metrics, evaluation/metrics.py Expressiveness/PCK)."""
    from mixstage_tpu.evaluation.metrics import PCK, Expressiveness

    _, pose, _ = factory._eval_step(state, batch, use_pose_input=False,
                                    sample_flag=True)
    y_cap = np.asarray(pose, np.float64).reshape(-1, 2, FEATS // 2)
    gt = np.asarray(y, np.float64).reshape(-1, 2, FEATS // 2)
    pck = PCK(num_joints=FEATS // 2)
    pck(y_cap, gt)
    expr = Expressiveness(mean=gt.reshape(gt.shape[0], -1).mean(0))
    expr(y_cap.reshape(y_cap.shape[0], -1), gt.reshape(gt.shape[0], -1))
    return {"pck": pck.get_averages("x")["x_pck"],
            "spatialNorm": expr.get_averages("x")["x_spatialNorm"]}


def run_bf16_arm(steps: int = 200):
    """bf16 vs f32 *training* dynamics within this framework (VERDICT r2
    item 1): N interleaved G/D steps from identical f32 master weights, one
    arm computing in bf16 (`-dtype bfloat16`: bf16 activations/losses/BN
    batch stats, f32 params + Adam), the other in f32.  Reports the
    loss-trajectory divergence at checkpoints and the end-state
    PCK/spatialNorm deltas — the collateral for the bf16 training headline
    and the jobs files' "≤1% quality drift" claim."""
    import jax
    import jax.numpy as jnp

    from mixstage_tpu.train.steps import StepConfig, StepFactory

    common = dict(model="JointLateClusterSoftStyle4_G", gan=True,
                  criterion="L1Loss", num_clusters=M, num_speakers=S, lr=1e-4)
    f32 = StepFactory(StepConfig(**common), donate=False)
    bf16 = StepFactory(StepConfig(**common, dtype=jnp.bfloat16), donate=False)

    rng = np.random.default_rng(5)
    audio = rng.normal(size=(B, T, MEL)).astype(np.float32)
    y = rng.normal(size=(B, T, FEATS)).astype(np.float32)
    batch = {"x": (jnp.asarray(audio),), "y": jnp.asarray(y),
             "labels": jnp.asarray(rng.integers(0, M, size=(B, T)), jnp.int32),
             "style": jnp.asarray(
                 np.repeat(rng.integers(0, S, size=(B, 1)), T, 1), jnp.int32)}
    state0 = f32.init(jax.random.key(0), batch)  # f32 master weights, shared

    coins = [(i % 3) == 2 for i in range(steps)]
    sf32, sf16 = state0, state0
    js32, js16 = f32.make_steps(), bf16.make_steps()
    losses32, losses16 = [], []
    for step, coin_d in enumerate(coins):
        k = jax.random.key(step)
        branch = "d" if coin_d else "g"
        sf32, out32, _ = js32[branch](sf32, batch, k, use_pose_input=False)
        sf16, out16, _ = js16[branch](sf16, batch, k, use_pose_input=False)
        losses32.append(float(out32["total"]))
        losses16.append(float(out16["total"]))

    a32, a16 = np.asarray(losses32), np.asarray(losses16)
    rel = np.abs(a16 - a32) / np.abs(a32)
    checkpoints = {str(n): float(rel[:n].max())
                   for n in (50, 100, steps) if n <= steps}
    q32 = _end_state_quality(f32, sf32, batch, y)
    q16 = _end_state_quality(bf16, sf16, batch, y)

    out = {"steps": steps,
           "f32": losses32, "bf16": losses16,
           "max_rel_divergence_at": checkpoints,
           "end_pck_f32": q32["pck"], "end_pck_bf16": q16["pck"],
           "end_spatialNorm_f32": q32["spatialNorm"],
           "end_spatialNorm_bf16": q16["spatialNorm"],
           "end_pck_rel_delta": abs(q16["pck"] - q32["pck"])
               / max(abs(q32["pck"]), 1e-9),
           "end_spatialNorm_rel_delta":
               abs(q16["spatialNorm"] - q32["spatialNorm"])
               / max(abs(q32["spatialNorm"]), 1e-9)}
    print(f"[bf16_vs_f32] {steps} steps: max rel loss divergence "
          + ", ".join(f"@{n}={v * 100:.3f}%"
                      for n, v in checkpoints.items())
          + f"; end PCK {q32['pck']:.4f} (f32) vs {q16['pck']:.4f} (bf16) "
          f"[Δ {out['end_pck_rel_delta'] * 100:.2f}%]; spatialNorm "
          f"{q32['spatialNorm']:.4f} vs {q16['spatialNorm']:.4f} "
          f"[Δ {out['end_spatialNorm_rel_delta'] * 100:.2f}%]")
    return out


def compare(name, torch_losses, jax_losses, coins):
    diffs = np.abs(np.array(torch_losses) - np.array(jax_losses))
    rel = diffs / np.abs(np.array(torch_losses))
    print(f"[{name}] step-wise |Δloss| max={diffs.max():.5f} "
          f"(rel {rel.max() * 100:.3f}%)")
    for i in range(0, len(coins), max(len(coins) // 10, 1)):
        print(f"  step {i:3d} [{'D' if coins[i] else 'G'}]: "
              f"torch {torch_losses[i]:.5f}  jax {jax_losses[i]:.5f}")
    return {"steps": len(coins), "coins": [int(c) for c in coins],
            "torch": torch_losses, "jax": jax_losses,
            "max_abs_diff": float(diffs.max()),
            "max_rel_diff": float(rel.max())}


def main(steps: int = 20, bf16_steps: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")

    out = {}
    if bf16_steps:
        out["bf16_vs_f32"] = run_bf16_arm(bf16_steps)
    if steps:
        # g_only: every step is a G step
        factory, state, batch, tG, tD, audio, y, labels, style_ids = setup()
        coins = [False] * steps
        out["g_only"] = compare(
            "g_only",
            run_torch(tG, tD, audio, y, labels, style_ids, coins),
            run_jax(factory, state, batch, coins), coins)

        # gan_mix: a D step every 3rd iteration (fixed, replica-consistent
        # coin pattern — the production path flips the same host coin on
        # both sides)
        factory, state, batch, tG, tD, audio, y, labels, style_ids = setup()
        coins = [(i % 3) == 2 for i in range(steps)]
        out["gan_mix"] = compare(
            "gan_mix",
            run_torch(tG, tD, audio, y, labels, style_ids, coins),
            run_jax(factory, state, batch, coins), coins)

    path = Path(__file__).parent / "dynamics_parity.json"
    if path.exists():  # merge so the bf16 arm can be run separately
        prev = json.load(open(path))
        prev.update(out)
        out = prev
    json.dump(out, open(path, "w"), indent=2)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bf16-steps", type=int, default=0,
                    help="also run the bf16-vs-f32 training arm for N steps")
    ns = ap.parse_args()
    main(ns.steps, ns.bf16_steps)
