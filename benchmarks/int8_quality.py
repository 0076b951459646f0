"""Int8 serving-tier quality on a TRAINED model.

`ops/pallas/quant.py` is an opt-in accuracy tier; its drift is measured,
never assumed.  Random-init weights overstate quantization error (tests pin
that envelope), so this script measures what a user actually cares about:
train the flagship GAN for N interleaved G/D steps on a fixed batch, build
the f32 serving path and the int8-quantized serving path from the SAME
trained checkpoint (calibrated on the training batch), and report

* the pose drift of int8 vs f32 serving (mean/max, relative to signal),
* the dev-selection quality metrics (PCK + spatialNorm — the reference's
  model-selection cascade, trainer.py:460-551) of BOTH paths against the
  ground-truth batch, and their relative delta.

Writes benchmarks/int8_quality.json.  Usage:
    python benchmarks/int8_quality.py [--steps 200]
(CPU; forces jax_platforms=cpu.)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

T, MEL, FEATS, M, S, B = 64, 128, 96, 4, 3, 4


def main(steps: int = 200):
    import jax
    import jax.numpy as jnp

    from mixstage_tpu.serve import build_serving_fn
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=M, num_speakers=S,
                     lr=1e-4)
    factory = StepFactory(cfg, donate=False)

    rng = np.random.default_rng(5)
    audio = rng.normal(size=(B, T, MEL)).astype(np.float32)
    y = rng.normal(size=(B, T, FEATS)).astype(np.float32)
    style_ids = rng.integers(0, S, size=(B,)).astype(np.int32)
    batch = {"x": (jnp.asarray(audio),), "y": jnp.asarray(y),
             "labels": jnp.asarray(rng.integers(0, M, size=(B, T)),
                                   jnp.int32),
             "style": jnp.asarray(np.repeat(style_ids[:, None], T, 1),
                                  jnp.int32)}
    state = factory.init(jax.random.key(0), batch)
    jsteps = factory.make_steps()
    for step in range(steps):                     # D every 3rd step
        branch = "d" if (step % 3) == 2 else "g"
        state, _, _ = jsteps[branch](state, batch, jax.random.key(step),
                                     use_pose_input=False)

    styles = jnp.asarray(style_ids)
    serve_f32 = build_serving_fn(factory, state, use_pallas=False)
    p32 = np.asarray(serve_f32(batch["x"][0], styles), np.float64)
    serve_i8 = build_serving_fn(factory, state, use_pallas=False,
                                quantize_int8=True,
                                calib=(audio, style_ids))
    p8 = np.asarray(serve_i8(batch["x"][0], styles), np.float64)

    scale = np.abs(p32).mean()
    drift_mean = float(np.abs(p8 - p32).mean() / scale)
    drift_max = float(np.abs(p8 - p32).max() / scale)

    def quality(pose):
        from mixstage_tpu.evaluation.metrics import PCK, Expressiveness
        y_cap = pose.reshape(-1, 2, FEATS // 2)
        gt = np.asarray(y, np.float64).reshape(-1, 2, FEATS // 2)
        pck = PCK(num_joints=FEATS // 2)
        pck(y_cap, gt)
        expr = Expressiveness(mean=gt.reshape(gt.shape[0], -1).mean(0))
        expr(y_cap.reshape(y_cap.shape[0], -1),
             gt.reshape(gt.shape[0], -1))
        return {"pck": pck.get_averages("x")["x_pck"],
                "spatialNorm": expr.get_averages("x")["x_spatialNorm"]}

    q32, q8 = quality(p32), quality(p8)
    out = {"steps": steps,
           "drift_mean_rel": drift_mean, "drift_max_rel": drift_max,
           "pck_f32": q32["pck"], "pck_int8": q8["pck"],
           "pck_rel_delta": abs(q8["pck"] - q32["pck"])
               / max(abs(q32["pck"]), 1e-9),
           "spatialNorm_f32": q32["spatialNorm"],
           "spatialNorm_int8": q8["spatialNorm"],
           "spatialNorm_rel_delta":
               abs(q8["spatialNorm"] - q32["spatialNorm"])
               / max(abs(q32["spatialNorm"]), 1e-9)}
    print(f"[int8_quality] {steps} trained steps: serving drift "
          f"mean {drift_mean:.3%} / max {drift_max:.3%}; "
          f"PCK {q32['pck']:.4f} (f32) vs {q8['pck']:.4f} (int8) "
          f"[Δ {out['pck_rel_delta']:.2%}]; spatialNorm "
          f"{q32['spatialNorm']:.4f} vs {q8['spatialNorm']:.4f} "
          f"[Δ {out['spatialNorm_rel_delta']:.2%}]")
    path = Path(__file__).parent / "int8_quality.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    main(ap.parse_args().steps)
