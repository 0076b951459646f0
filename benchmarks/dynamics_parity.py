"""Multi-step training-dynamics comparison vs the PyTorch reference.

Runs N deterministic Mix-StAGE G-steps on a fixed batch, starting from
IDENTICAL weights, in both frameworks:

* torch: reference model files + a manual G-branch loop replicating the
  trainer semantics (L1 pose + λ(t)·L1 GAN term + internal losses, Adam,
  grad-clip 1 over all G params incl. the pose-style encoder);
* jax: this framework's actual jitted ``g_step``.

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


def main(steps: int = 20):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
    from test_torch_parity import (_load_ref, copy_cnr, randomize_bn_stats,
                                   t2j_conv1d)

    from mixstage_tpu.train.losses import lambda_schedule
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    ref_jl = _load_ref("joint_late_cluster_soft_style")
    ref_s2g = _load_ref("speech2gesture")

    T, MEL, FEATS, M, S, B = 64, 128, 96, 4, 3, 4
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
    jsteps = factory.make_steps()

    # ---- torch loop ---------------------------------------------------------
    kwargs = dict(input_modalities=["audio/log_mel_512"],
                  style=torch.from_numpy(style_ids).long(), sample_flag=0,
                  description="train", epoch=0)
    ta, tl, ty = (torch.from_numpy(audio), torch.from_numpy(labels).long(),
                  torch.from_numpy(y))
    g_optim = torch.optim.Adam(tG.parameters(), lr=1e-4)
    torch_losses = []
    for step in range(steps):
        g_optim.zero_grad()
        y_cap, internal = tG([ta, tl], ty, **kwargs)
        xv = y_cap[..., 1:, :] - y_cap[..., :-1, :]
        fake_v = torch.cat([torch.zeros_like(y_cap[..., 0:1, :]), xv], dim=-2)
        score, _ = tD(fake_v)
        lam = float(lambda_schedule(step, 1.0))
        loss = (torch.nn.functional.l1_loss(y_cap, ty)
                + lam * torch.nn.functional.l1_loss(score, torch.ones_like(score))
                + sum(internal))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tG.parameters(), 1)
        g_optim.step()
        torch_losses.append(float(loss))

    # ---- jax loop -----------------------------------------------------------
    jax_losses = []
    for step in range(steps):
        state, losses, _ = jsteps["g"](state, batch, jax.random.key(step),
                                       use_pose_input=False)
        jax_losses.append(float(losses["total"]))

    diffs = np.abs(np.array(torch_losses) - np.array(jax_losses))
    rel = diffs / np.abs(np.array(torch_losses))
    out = {"steps": steps, "torch": torch_losses, "jax": jax_losses,
           "max_abs_diff": float(diffs.max()),
           "max_rel_diff": float(rel.max())}
    json.dump(out, open(Path(__file__).parent / "dynamics_parity.json", "w"),
              indent=2)
    print(f"step-wise |Δloss| max={diffs.max():.5f} "
          f"(rel {rel.max() * 100:.3f}%)")
    for i in range(0, steps, max(steps // 10, 1)):
        print(f"  step {i:3d}: torch {torch_losses[i]:.5f}  "
              f"jax {jax_losses[i]:.5f}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    main(ap.parse_args().steps)
