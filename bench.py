"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): pose frames/sec/chip at batch 32 on the flagship
Mix-StAGE 8-speaker / 8-cluster adversarial training step, vs the PyTorch
reference measured on CPU fp64 (benchmarks/reference_cpu.json, measured with
benchmarks/bench_reference.py in this container: 412.8 frames/s).

Timing methodology (round-2 rewrite): ``jax.block_until_ready`` does NOT
synchronize through the axon tunnel (a "blocked" call returns in ~3 ms while
the device is still busy), so every timed region here ends with a forced
host fetch of a scalar that data-depends on the final step.  Per-call
marginal device cost is obtained by *differential chain timing*: time a
chain of N state-threaded calls ending in one fetch, subtract the time of a
1-call chain (which carries the same dispatch + fetch RTT), divide by N-1.
This amortizes the ~30 ms tunnel RTT out of the marginal number.  End-to-end
latency (including the fetch) is reported separately for serving.

Exactly one JSON line goes to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REF_FILE = Path(__file__).parent / "benchmarks" / "reference_cpu.json"
REF_FRAMES_PER_SEC = 412.78  # measured fallback (1-core CPU, fp64, bs32)
V5E_BF16_PEAK_FLOPS = 197e12  # per-chip bf16 peak, MFU denominator


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# The driver contract is ONE JSON line on stdout.  Library code reached by
# the sampling/endpoint/streaming sections carries the reference's chatty
# parity prints ("Data Loaded", "Calculating KMeans model …",
# trainer.py:116/205, transforms.py:114-220) — main() reroutes sys.stdout
# to stderr and the JSON record goes through the saved real stdout.
_REAL_STDOUT = sys.stdout


def emit(obj) -> None:
    print(json.dumps(obj), file=_REAL_STDOUT, flush=True)


def tpu_preflight(max_tries: int = 3, timeout_s: int = 150) -> bool:
    """Bounded device probe.  The axon tunnel can go hard-down, in which case
    jax backend init (and any first computation) hangs *indefinitely* rather
    than erroring — observed 2026-08-17.  Probing in a subprocess with a
    timeout is the only reliable bound; in-process SIGALRM may never fire if
    the init is stuck in foreign code.  Returns True when a trivial matmul
    round-trips; retries with backoff so a transient tunnel blip survives."""
    import subprocess

    code = ("import jax, numpy as np; x = jax.numpy.ones((8, 8)); "
            "print(float(np.asarray((x @ x).sum())))")
    for attempt in range(1, max_tries + 1):
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True,
                               text=True)
            if r.returncode == 0:
                log(f"preflight ok in {time.perf_counter() - t0:.1f}s "
                    f"(attempt {attempt})")
                return True
            log(f"preflight attempt {attempt} rc={r.returncode}: "
                f"{r.stderr.strip()[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"preflight attempt {attempt} timed out after {timeout_s}s "
                "(device backend hang)")
        if attempt < max_tries:
            time.sleep(30)
    return False


def fetch(x) -> float:
    """Force a host round-trip on a device scalar (the only true sync)."""
    return float(np.asarray(x))


def chain_time(run_chain, n: int) -> float:
    """Wall time of n state-threaded calls ending in one scalar fetch."""
    t0 = time.perf_counter()
    scalar = run_chain(n)
    fetch(scalar)
    return time.perf_counter() - t0


def marginal_time(run_chain, n: int = 16, reps: int = 3) -> float:
    """Differential marginal seconds/call: (T(n) - T(1)) / (n - 1).

    Takes the median over reps of each chain length; T(1) carries the same
    dispatch + tunnel-RTT constant as T(n), so the difference is device time.
    """
    t1 = float(np.median([chain_time(run_chain, 1) for _ in range(reps)]))
    tn = float(np.median([chain_time(run_chain, n) for _ in range(reps)]))
    return max((tn - t1) / (n - 1), 1e-9)


def repeat_measure(measure, name: str, repeats: int = 3):
    """Variance-robust section timing (VERDICT r4 weak #1): run the whole
    section measurement K>=3 times, report the median; while the RTT
    canary trips OR the dispersion exceeds 25% (degradation during the
    repeats that recovered before the canary read), take up to 2 extra
    repeats before accepting, so one bad transport window cannot write a
    2x-off number into the round's official record unannotated.

    Returns (median_seconds, meta) where meta carries the per-section
    repeat count, relative spread (max-min)/median, and the
    before/after/worst section RTTs — everything a cross-round reader
    needs to tell code regression from tunnel weather.
    """
    def spread_of(vs):
        m = float(np.median(vs))
        return (max(vs) - min(vs)) / m if m > 0 else 0.0

    rtts = [session_rtt_ms(3)]
    vals = [measure() for _ in range(repeats)]
    rtts.append(session_rtt_ms(3))
    # take up to 2 extra repeats while EITHER signal says the section is
    # untrustworthy: the RTT canary (transport degraded right now) or the
    # dispersion itself (>25% spread — degradation DURING the repeats that
    # recovered before the canary read, which a post-hoc RTT can't see)
    extras = 0
    while extras < 2 and (rtts[-1] > 15.0 or spread_of(vals) > 0.25):
        log(f"{name}: untrustworthy section (post-RTT {rtts[-1]} ms/sync, "
            f"spread {spread_of(vals):.1%}); taking an extra repeat")
        vals.append(measure())
        rtts.append(session_rtt_ms(3))
        extras += 1
    med = float(np.median(vals))
    spread = round(spread_of(vals), 4)
    log(f"{name}: {len(vals)} repeats, median {med * 1e3:.3f} ms, "
        f"spread {spread:.1%}, RTT before/after/worst "
        f"{rtts[0]}/{rtts[-1]}/{max(rtts)} ms")
    return med, {"repeats": len(vals), "spread": spread,
                 "rtt_before_ms": rtts[0], "rtt_after_ms": rtts[-1],
                 "rtt_worst_ms": max(rtts)}


def remeasure_reference_cpu(iters: int = 10, timeout_s: int = 480,
                            samples: int = 3):
    """Re-measure the torch-CPU denominator this round (VERDICT r4 item 6):
    the frozen 412.8 frames/s was measured 2026-08-16; a container/torch
    change would silently skew every future vs_baseline ratio.  Runs the
    GAN-train section of benchmarks/bench_reference.py in subprocesses
    (fresh torch, no TPU contention — called BEFORE any device work) with
    the SAME iters=10 protocol the frozen number used, and takes the
    median of ``samples`` whole subprocess runs: this shared 1-core host's
    CPU allocation varies run-to-run (445/561/453 frames/s measured
    back-to-back on 2026-08-21, ~23%% spread), so a single sample would
    make the 10%% divergence gate a coin flip.  Returns frames/s or None.
    """
    import subprocess

    code = (
        "import sys; sys.path.insert(0, 'benchmarks'); "
        "import bench_reference as br, json; "
        f"print('REF_JSON ' + json.dumps(br.bench_mixstage_train(32, {iters})))"
    )

    def one_sample():
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True,
                           cwd=str(Path(__file__).parent))
        if r.returncode != 0:
            log(f"reference remeasure rc={r.returncode}: "
                f"{r.stderr.strip()[-300:]}")
            return None
        line = next(ln for ln in r.stdout.splitlines()
                    if ln.startswith("REF_JSON "))
        return float(json.loads(line[len("REF_JSON "):])["frames_per_sec"])

    try:
        vals = [v for v in (one_sample() for _ in range(samples))
                if v is not None]
        if vals:
            med = float(np.median(vals))
            log(f"reference remeasure: {len(vals)} samples "
                f"{[round(v, 1) for v in vals]}, median {med:.1f} frames/s")
            return med
    except Exception as e:  # noqa: BLE001 — never risk the headline
        log(f"reference remeasure unavailable ({e})")
    return None


def flops_of(jitted, *args, **kwargs):
    """XLA cost-analysis FLOPs of one call, or None if unavailable."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:  # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
        return None


def build(dtype, donate, fused_decoder=False):
    import jax.numpy as jnp

    from mixstage_tpu.train.steps import StepConfig, StepFactory

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=8, num_speakers=8,
                     dtype=dtype, fused_decoder=fused_decoder)
    return StepFactory(cfg, donate=donate)


def bench_scan(factory, B, k, seed0=100, reps=3, chain=8):
    """Marginal seconds per *training step* of the k-step fused scan driver."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from mixstage_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    mesh = make_mesh()
    batches = [_example_batch(B=B, seed=seed0 + i) for i in range(k)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    if factory.cfg.dtype == jnp.bfloat16:
        stacked = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, stacked)
    stacked = shard_batch(stacked, mesh, leading_axis=1)
    coins = jnp.asarray(np.random.default_rng(0).random(k) < factory.cfg.d_prob)
    rngs = jnp.stack([jax.random.key(i) for i in range(k)])
    scan_fn = factory.make_scan_train_step(k)
    state = factory.init(jax.random.key(0), batches[0])
    state = replicate_state(state, mesh)

    holder = {"state": state}

    def run_chain(n):
        losses = None
        for _ in range(n):
            holder["state"], losses, _ = scan_fn(holder["state"], stacked,
                                                 coins, rngs)
        return losses["total"][-1]

    run_chain(1)  # compile warmup
    sec_per_call = marginal_time(run_chain, n=chain, reps=reps)
    return sec_per_call / k, scan_fn, (holder["state"], stacked, coins, rngs)


def bench_serving_endpoint(serve, audio32, n_clients: int = 8,
                           per_client: int = 24):
    """Production serving path: the DynamicBatcher over the live TPU serving
    fn under concurrent single-window clients — request latency (p50/p99),
    achieved occupancy, and end-to-end request rate through the batching
    layer (mixstage_tpu/serving/server.py)."""
    import threading

    import jax.numpy as jnp

    from mixstage_tpu.serving import DynamicBatcher

    audio_np = np.asarray(audio32)

    def run(a, s):
        return np.asarray(serve(jnp.asarray(a), s))

    batcher = DynamicBatcher(run, batch_size=audio_np.shape[0],
                             max_wait_ms=2.0)
    try:
        batcher.submit(audio_np[0], 0).result(300)  # warm-up / compile reuse
        t0 = time.perf_counter()

        def client(i):
            for k in range(per_client):
                batcher.submit(audio_np[(i + k) % len(audio_np)],
                               0).result(300)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        st = batcher.stats()
        out = {
            "endpoint_requests_per_sec": round(
                n_clients * per_client / wall, 1),
            "endpoint_latency_ms_p50": st["latency_ms_p50"],
            "endpoint_latency_ms_p99": st["latency_ms_p99"],
            "endpoint_mean_batch_occupancy": st["mean_occupancy"],
        }
        log(f"serving endpoint: {out['endpoint_requests_per_sec']} req/s, "
            f"p50 {out['endpoint_latency_ms_p50']} ms, occupancy "
            f"{out['endpoint_mean_batch_occupancy']}/{audio_np.shape[0]}")
        return out
    finally:
        batcher.close()


def bench_sampling():
    """Sampling/style-transfer path (VERDICT r2 item 3): whole-interval
    bucketed inference (train/sampling.py::sample_loop) + the full host
    metric cascade, with the metric math overlapped behind the TPU via the
    _MetricWorker thread.  Timed on the second pass (first pass pays the
    per-length-bucket compiles).  Reference semantics: trainer.py:705-849."""
    import tempfile

    from mixstage_tpu.config import config_from_dict
    from mixstage_tpu.data.synthetic import make_synthetic_dataset
    from mixstage_tpu.train.sampling import sample_loop
    from mixstage_tpu.train.trainer import Trainer

    data_dir = "/tmp/bench_pats_sampling"
    if not (Path(data_dir) / "cmu_intervals_df.csv").exists():
        make_synthetic_dataset(data_dir, ["oliver", "maher"],
                               num_intervals_per_speaker=8)
    save_dir = tempfile.mkdtemp(prefix="bench_sample_")
    cfg = config_from_dict(dict(
        path2data=data_dir, speaker=["oliver", "maher"],
        modalities=["pose/data", "audio/log_mel_512"], fs_new=[15, 15],
        batch_size=32, window_hop=0, save_dir=save_dir, exp=90,
        model="JointLateClusterSoftStyle4_G", gan=1, loss="L1Loss",
        num_clusters=8, metrics=1, render=0))
    tr = Trainer(cfg, ["exp", "cpk", "speaker", "model", "note"], {})
    # Trainer.sample() sets dir_name before its sample_loop calls — mirror it
    tr.dir_name = tr.book.name.dir(cfg.save_dir)
    log("sampling: warm-up pass (per-bucket compiles)…")
    sample_loop(tr, "test")
    t0 = time.perf_counter()
    sample_loop(tr, "test")
    wall = time.perf_counter() - t0
    times = np.asarray(tr._sample_interval_times)
    n = len(times)
    overlap_s = tr._sample_metric_overlap_s
    out = {
        "sampling_intervals_per_sec": round(n / wall, 2),
        "sampling_p50_interval_ms": round(float(np.median(times)) * 1e3, 1),
        "sampling_host_metric_s_per_interval": round(overlap_s / n, 4),
        "sampling_metric_overlap_fraction":
            round(min(overlap_s / wall, 1.0), 3),
        "sampling_n_intervals": n,
        "sampling_wall_s": round(wall, 2)}
    log(f"sampling: {n} intervals in {wall:.2f}s "
        f"({out['sampling_intervals_per_sec']} intervals/s, p50 "
        f"{out['sampling_p50_interval_ms']} ms/interval; host metric math "
        f"{overlap_s:.2f}s overlapped behind the TPU)")
    return out


def bench_streaming(serve, T: int, mel: int, n_stream_frames: int = 640):
    """Streaming inference path (mixstage_tpu/streaming.py): overlapped
    64-frame windows + crossfade over the live serving fn, fed frame-at-a-time
    the way a real-time client would.  Reports achieved stream throughput,
    the real-time factor vs the 15 fps pose rate (dataUtils.py:510-527 fs
    contract), and the p50 per-window inference latency.  Reuses the (1, T,
    mel) serving compilation bench.main already warmed."""
    from mixstage_tpu.streaming import session_over_serving_fn

    rng = np.random.default_rng(7)
    mel_frames = rng.normal(size=(n_stream_frames, mel)).astype(np.float32)
    # warm pass: first window pays any residual compile/caching
    warm = session_over_serving_fn(serve, 0)
    warm.feed(mel_frames[:T])
    warm.finish()

    sess = session_over_serving_fn(serve, 0)
    win_lat = []
    orig_run = sess._run_window

    def timed_run(start):
        t0 = time.perf_counter()
        orig_run(start)
        win_lat.append(time.perf_counter() - t0)

    sess._run_window = timed_run
    t0 = time.perf_counter()
    got = 0
    for f in mel_frames:          # frame-at-a-time: the worst-case feed
        got += sess.feed(f).shape[0]
    got += sess.finish().shape[0]
    wall = time.perf_counter() - t0
    assert got == n_stream_frames, (got, n_stream_frames)
    fps = n_stream_frames / wall
    out = {
        "streaming_frames_per_sec_1session": round(fps, 1),
        "streaming_realtime_factor_at_15fps": round(fps / 15.0, 1),
        "streaming_p50_window_ms": round(
            float(np.median(win_lat)) * 1e3, 2),
        "streaming_windows_run": len(win_lat),
    }
    log(f"streaming: {fps:,.0f} pose frames/s single session "
        f"({out['streaming_realtime_factor_at_15fps']}x real-time at 15 fps; "
        f"p50 window {out['streaming_p50_window_ms']} ms, "
        f"{len(win_lat)} windows)")
    return out


def _host_only_extras() -> dict:
    """TPU-free measurements for the preflight-failure record: the render
    path and the host input pipeline are real, CPU-measured subsystems —
    they keep the failure JSON from being signal-free without fabricating
    any device number."""
    out = {}
    try:
        from mixstage_tpu.animation import raster
        from mixstage_tpu.data.skeleton import PARENTS

        y = np.cumsum(np.random.default_rng(0).normal(size=(64, 2, 52)),
                      0) * 10
        raster.rasterize(y, PARENTS)  # warm (lib load)
        t0 = time.perf_counter()
        raster.rasterize(y, PARENTS)
        out["host_render_raster_frames_per_sec"] = round(
            64 / (time.perf_counter() - t0), 1)
    except Exception as e:  # noqa: BLE001
        log(f"host render extra unavailable ({e})")
    try:
        pipe = Path(__file__).parent / "benchmarks" / "input_pipeline.json"
        if pipe.exists():
            out["host_pipeline_frames_per_sec_1core"] = json.load(
                open(pipe))["host_pipeline_frames_per_sec_1core"]
    except Exception as e:  # noqa: BLE001
        log(f"host pipeline extra unavailable ({e})")
    return out


def session_rtt_ms(n: int = 5) -> float:
    """Median host→device→host round-trip of a trivial jitted op — the
    degraded-tunnel canary.  A healthy session syncs in ~3-7 ms; degraded
    sessions sit at ~27-32 ms/sync (CLAUDE.md environment note) and poison
    every per-call section measured after the degradation, so the extras
    record the RTT at section boundaries to make bad numbers attributable
    to the transport rather than the code."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[n // 2] * 1e3, 2)


def main():
    sys.stdout = sys.stderr  # keep stdout to exactly one JSON line (emit)
    if not tpu_preflight():
        # The device backend is unreachable: emit an honest, parseable
        # failure record instead of hanging the driver.  Last good numbers
        # remain in the newest BENCH_r*.json; nothing here is fabricated —
        # the only measurements included are host-side ones that need no TPU.
        benches = sorted(Path(__file__).parent.glob("BENCH_r*.json"))
        last_good = benches[-1].name if benches else "none recorded"
        emit({
            "metric": "mixstage_gan_train_pose_frames_per_sec_per_chip_bs32",
            "value": 0.0,
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            "extras": {
                "error": "tpu_backend_unreachable: backend init/first matmul "
                         "hung past the preflight bound on 3 attempts; see "
                         f"stderr.  Last good driver run: {last_good}.",
                **_host_only_extras()},
        })
        sys.exit(1)

    # CPU denominator health check FIRST: torch-only subprocess, no device
    # contention (the TPU sections haven't started yet, and torch never
    # shares the process with jax here)
    ref_remeasured = remeasure_reference_cpu()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from mixstage_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    ref = REF_FRAMES_PER_SEC
    if REF_FILE.exists():
        ref = json.load(open(REF_FILE))["mixstage_gan_train_bs32"]["frames_per_sec"]
    # None (not False) when the remeasure never ran: the record must not
    # claim "checked, not diverged" for a check that was unavailable
    ref_diverged = (None if ref_remeasured is None
                    else abs(ref_remeasured - ref) / ref > 0.10)
    if ref_remeasured is not None:
        log(f"reference CPU denominator: frozen {ref:.1f}, remeasured now "
            f"{ref_remeasured:.1f} frames/s"
            + (" — DIVERGED >10%, vs_baseline may be skewed"
               if ref_diverged else " (within 10%)"))

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()}")
    B, T = 32 * n_chips, 64

    factory = build(jnp.float32, donate=True)
    mesh = make_mesh()
    batch = _example_batch(B=B)
    state = factory.init(jax.random.key(0), batch)
    state = replicate_state(state, mesh)
    batch = shard_batch(batch, mesh)
    steps = factory.make_steps()

    # FLOP truth for the MFU line
    g_flops = flops_of(steps["g"], state, batch, jax.random.key(1),
                       use_pose_input=False)
    d_flops = flops_of(steps["d"], state, batch, jax.random.key(1),
                       use_pose_input=False)

    rtt_start = session_rtt_ms()
    log(f"session RTT canary at start: {rtt_start} ms/sync")

    # ---- per-step training path (dispatch-bound through the tunnel) -------
    log("compiling per-step G/D…")
    holder = {"state": state}

    def g_chain(n):
        losses = None
        for i in range(n):
            holder["state"], losses, _ = steps["g"](
                holder["state"], batch, jax.random.key(i + 2),
                use_pose_input=False)
        return losses["total"]

    g_chain(1)
    per_step_sec, per_step_meta = repeat_measure(
        lambda: marginal_time(g_chain, n=16), "per-step train")
    per_step_fps = B * T / per_step_sec / n_chips
    log(f"train G-step (per-dispatch): {per_step_sec * 1e3:.2f} ms/step, "
        f"{per_step_fps:,.0f} frames/s/chip")

    def d_chain(n):
        losses = None
        for i in range(n):
            holder["state"], losses, _ = steps["d"](
                holder["state"], batch, jax.random.key(i + 50),
                use_pose_input=False)
        return losses["total"]

    d_chain(1)
    d_step_sec = marginal_time(d_chain, n=16)
    log(f"train D-step (per-dispatch): {d_step_sec * 1e3:.2f} ms/step")

    # ---- fused multi-step driver (the production training path) -----------
    k = 16
    log(f"compiling scan(k={k}) f32…")
    scan_sec, _, _ = bench_scan(factory, B, k)
    scan_fps = B * T / scan_sec / n_chips
    # the scan interleaves G and D steps by the same coin array bench_scan
    # uses; weight the per-step FLOPs by that mix
    n_d = int((np.random.default_rng(0).random(k)
               < factory.cfg.d_prob).sum())
    step_flops = ((n_d * d_flops + (k - n_d) * g_flops) / k
                  if g_flops and d_flops else None)
    mfu = (step_flops / scan_sec / V5E_BF16_PEAK_FLOPS
           if step_flops else None)
    log(f"train scan(k={k}) f32: {scan_sec * 1e3:.3f} ms/step, "
        f"{scan_fps:,.0f} frames/s/chip"
        + (f", MFU≈{mfu:.1%} (bf16-peak denom)" if mfu else ""))

    # ---- bf16 compute variant (k=64: per-dispatch overhead ~5-7 ms spreads
    # over 4x more steps than k=16 — measured +13%/step, benchmarks of
    # 2026-08-17; identical SGD semantics at any k) ------------------------
    bf16_fps = mfu_bf16 = None
    bf16_factory = None
    batch_scaling = {}
    k_bf16 = 64
    try:
        log(f"compiling scan(k={k_bf16}) bf16…")
        bf16_factory = build(jnp.bfloat16, donate=True)
        bf16_sec, _, _ = bench_scan(
            bf16_factory, B, k_bf16, chain=max(3, 96 // k_bf16))
        bf16_fps = B * T / bf16_sec / n_chips
        # the SECOND MFU definition, self-described (VERDICT r4 weak #2):
        # per-step FLOPs = the g/d cost-analysis numbers weighted by the
        # exact k=64 coin mix the scan ran (same method as the f32 line —
        # XLA cost analysis of the scan PROGRAM counts the while body only
        # once, so it cannot be used directly; measured 2026-08-21)
        n_d64 = int((np.random.default_rng(0).random(k_bf16)
                     < factory.cfg.d_prob).sum())
        step_flops64 = ((n_d64 * d_flops + (k_bf16 - n_d64) * g_flops)
                        / k_bf16 if g_flops and d_flops else None)
        mfu_bf16 = (step_flops64 / bf16_sec / V5E_BF16_PEAK_FLOPS
                    if step_flops64 else None)
        log(f"train scan(k={k_bf16}) bf16: {bf16_sec * 1e3:.3f} ms/step, "
            f"{bf16_fps:,.0f} frames/s/chip"
            + (f", MFU {mfu_bf16:.1%} vs bf16 peak" if mfu_bf16 else ""))
    except Exception as e:  # noqa: BLE001
        log(f"bf16 path failed ({e}); keeping f32 headline")

    # ---- batch scaling: put the bs64/bs128 efficiency claim in the
    # driver-captured record (VERDICT r4 weak #2 — previously docs-only) ----
    if bf16_factory is not None and bf16_fps:
        for bs in (64, 128):
            try:
                log(f"compiling scan(k={k_bf16}) bf16 bs{bs}…")
                sec, _, _ = bench_scan(bf16_factory, bs * n_chips,
                                       k_bf16, chain=3)
                fps = bs * T / sec
                # per-sample FLOPs are linear in batch; scale the bs32
                # coin-mix step FLOPs (cost analysis ran at bs32)
                mfu_bs = (step_flops64 * (bs / 32) / sec
                          / V5E_BF16_PEAK_FLOPS if step_flops64 else None)
                batch_scaling[
                    f"scan_k64_bf16_bs{bs}_frames_per_sec_per_chip"] = \
                    round(fps, 1)
                if mfu_bs:
                    batch_scaling[f"scan_k64_bf16_bs{bs}_mfu_vs_bf16_peak"] \
                        = round(mfu_bs, 4)
                log(f"train scan(k={k_bf16}) bf16 bs{bs}: "
                    f"{sec * 1e3:.3f} ms/step, {fps:,.0f} frames/s/chip"
                    + (f", MFU {mfu_bs:.1%} vs bf16 peak" if mfu_bs else ""))
            except Exception as e:  # noqa: BLE001
                log(f"bs{bs} bf16 scan failed ({e}); recording null")

    # ---- fused-decoder variant (-fused_decoder: the mixture decoder's
    # fwd+bwd as Pallas kernels, weights consumed as stored) ---------------
    fused_fps = None
    try:
        log(f"compiling scan(k={k_bf16}) bf16 + fused decoder…")
        fused_factory = build(jnp.bfloat16, donate=True, fused_decoder=True)
        fused_sec, _, _ = bench_scan(fused_factory, B, k_bf16,
                                     chain=max(3, 96 // k_bf16))
        fused_fps = B * T / fused_sec / n_chips
        log(f"train scan(k={k_bf16}) bf16 fused-decoder: "
            f"{fused_sec * 1e3:.3f} ms/step, {fused_fps:,.0f} frames/s/chip")
    except Exception as e:  # noqa: BLE001
        log(f"fused-decoder path failed ({e}); keeping flax bf16 headline")

    headline_fps = max(scan_fps, per_step_fps, bf16_fps or 0.0,
                       fused_fps or 0.0)

    # ---- serving: p50 audio→pose latency per 64-frame clip -----------------
    eval_factory = build(jnp.float32, donate=False)
    ebatch = _example_batch(B=B)
    rtt_serving = session_rtt_ms()
    log(f"session RTT canary before serving section: {rtt_serving} ms/sync")
    estate = eval_factory.init(jax.random.key(0), ebatch)
    try:
        from mixstage_tpu.serve import build_serving_fn

        serve = build_serving_fn(eval_factory, estate)
    except Exception as e:  # noqa: BLE001
        log(f"fused serving path unavailable ({e}); timing the eval graph")
        esteps = eval_factory.make_steps()

        def serve(audio, style_ids):
            b = dict(_example_batch(B=audio.shape[0], seed=3))
            b["x"] = (audio,)
            return esteps["eval"](estate, b, use_pose_input=False,
                                  sample_flag=True)[1]

    clip_audio = _example_batch(B=1, seed=3)["x"][0]
    style1 = np.zeros((1,), np.int32)

    # end-to-end latency: dispatch + device + tunnel fetch of the pose
    np.asarray(serve(clip_audio, style1))  # compile warmup
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(serve(clip_audio, style1))
        lat.append(time.perf_counter() - t0)
    p50_e2e = float(np.median(lat)) * 1e3

    # device-marginal latency: chained self-feeding calls, one scalar fetch
    def serve_chain(n):
        out = None
        for _ in range(n):
            out = serve(clip_audio, style1)
        return out.sum()

    p50_dev_sec, p50_dev_meta = repeat_measure(
        lambda: marginal_time(serve_chain, n=16), "device p50 (1-clip)")
    p50_dev = p50_dev_sec * 1e3
    log(f"serving 1-clip: device-marginal {p50_dev:.2f} ms, "
        f"end-to-end (incl. tunnel fetch) p50 {p50_e2e:.2f} ms")

    # serving throughput at bs32 (device-marginal)
    audio32 = _example_batch(B=32, seed=4)["x"][0]
    style32 = np.zeros((32,), np.int32)
    np.asarray(serve(audio32, style32))

    def serve32_chain(n):
        out = None
        for _ in range(n):
            out = serve(audio32, style32)
        return out.sum()

    serve32_sec, serve32_meta = repeat_measure(
        lambda: marginal_time(serve32_chain, n=16), "serving f32 bs32")
    serve_fps = 32 * T / serve32_sec

    # the f32 reference output shared by the bf16/int8 drift sections — kept
    # best-effort (ADVICE r3): a transient failure here must only degrade
    # those sections to null, not abort the whole benchmark
    try:
        ref_out = np.asarray(serve(audio32, style32), np.float64)
    except Exception as e:  # noqa: BLE001
        log(f"f32 drift-reference call failed ({e}); "
            f"skipping bf16/int8 drift sections")
        ref_out = None

    # bf16 serving variant: same weights, bf16 compute (~+11%, ~0.5% drift —
    # within the 1% fused-serving contract)
    bf16_serve_fps = bf16_serve_drift = None
    bf16_serve_meta = int8_serve_meta = {}
    try:
        if ref_out is None:
            raise RuntimeError("no f32 reference output")
        bf16_eval = build(jnp.bfloat16, donate=False)
        serve16 = build_serving_fn(bf16_eval, estate)
        a16 = audio32.astype(jnp.bfloat16)
        out16 = np.asarray(serve16(a16, style32), np.float64)
        bf16_serve_drift = float(np.abs(out16 - ref_out).mean()
                                 / np.abs(ref_out).mean())

        def serve16_chain(n):
            out = None
            for _ in range(n):
                out = serve16(a16, style32)
            return out.sum()

        bf16_serve_sec, bf16_serve_meta = repeat_measure(
            lambda: marginal_time(serve16_chain, n=16), "serving bf16 bs32")
        bf16_serve_fps = 32 * T / bf16_serve_sec
        log(f"serving bs32 bf16: {bf16_serve_fps:,.0f} frames/s/chip "
            f"(drift vs f32 {bf16_serve_drift:.3%})")
    except Exception as e:  # noqa: BLE001
        log(f"bf16 serving unavailable ({e})")

    # int8 serving tier (ops/pallas/quant.py): post-training symmetric
    # quantization of the mixture decoder (~52 of the ~62 GFLOP per call) —
    # int8 MXU dots run at ~2x the bf16 rate on v5e.  Opt-in accuracy tier:
    # the drift is measured and reported (a few percent, outside the 1%
    # fused-path contract), never assumed.
    int8_serve_fps = int8_serve_drift = None
    try:
        if ref_out is None:
            raise RuntimeError("no f32 reference output")
        serve8 = build_serving_fn(eval_factory, estate, quantize_int8=True,
                                  calib=(audio32, style32))
        out8 = np.asarray(serve8(audio32, style32), np.float64)
        int8_serve_drift = float(np.abs(out8 - ref_out).mean()
                                 / np.abs(ref_out).mean())

        def serve8_chain(n):
            out = None
            for _ in range(n):
                out = serve8(audio32, style32)
            return out.sum()

        int8_serve_sec, int8_serve_meta = repeat_measure(
            lambda: marginal_time(serve8_chain, n=16), "serving int8 bs32")
        int8_serve_fps = 32 * T / int8_serve_sec
        log(f"serving bs32 int8: {int8_serve_fps:,.0f} frames/s/chip "
            f"(drift vs f32 {int8_serve_drift:.3%})")
    except Exception as e:  # noqa: BLE001
        log(f"int8 serving unavailable ({e})")
    if hasattr(serve, "jitted"):
        style_arg = (serve.style_weights(style32, audio32)
                     if hasattr(serve, "style_weights") else style32)
        serve_flops = flops_of(serve.jitted, *serve.bound_args,
                               audio32, style_arg)
    else:
        serve_flops = flops_of(serve, audio32, style32)
    serve_tflops = (serve_flops / serve32_sec / 1e12) if serve_flops else None
    log(f"serving throughput bs32 (device-marginal): "
        f"{serve_fps:,.0f} frames/s/chip"
        + (f", {serve_tflops:.1f} TFLOP/s achieved" if serve_tflops else ""))
    if REF_FILE.exists():
        ref_lat = json.load(open(REF_FILE))["mixstage_infer_clip"][
            "p50_latency_sec"] * 1e3
        log(f"reference CPU 1-clip latency: {ref_lat:.1f} ms")

    try:
        sampling_extras = bench_sampling()
    except Exception as e:  # noqa: BLE001 — never risk the headline
        log(f"sampling bench unavailable ({e})")
        sampling_extras = {}

    try:
        endpoint_extras = bench_serving_endpoint(serve, audio32)
    except Exception as e:  # noqa: BLE001 — never risk the headline
        log(f"serving-endpoint bench unavailable ({e})")
        endpoint_extras = {}

    try:
        streaming_extras = bench_streaming(serve, T, clip_audio.shape[-1])
    except Exception as e:  # noqa: BLE001 — never risk the headline
        log(f"streaming bench unavailable ({e})")
        streaming_extras = {}

    rtt_end = session_rtt_ms()
    log(f"session RTT canary at end: {rtt_end} ms/sync")
    emit({
        "metric": "mixstage_gan_train_pose_frames_per_sec_per_chip_bs32",
        "value": round(headline_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(headline_fps / ref, 2),
        "extras": {
            "timing_method": "differential chain timing + forced host fetch "
                             "(block_until_ready is a no-op via the tunnel)",
            "per_step_train_frames_per_sec_per_chip": round(per_step_fps, 1),
            "per_step_train_repeats": per_step_meta["repeats"],
            "per_step_train_spread": per_step_meta["spread"],
            "scan_k16_f32_frames_per_sec_per_chip": round(scan_fps, 1),
            "scan_k64_bf16_frames_per_sec_per_chip":
                round(bf16_fps, 1) if bf16_fps else None,
            "scan_k64_bf16_fused_decoder_frames_per_sec_per_chip":
                round(fused_fps, 1) if fused_fps else None,
            **batch_scaling,
            "g_step_gflops": round(g_flops / 1e9, 1) if g_flops else None,
            "d_step_gflops": round(d_flops / 1e9, 1) if d_flops else None,
            # TWO MFU definitions, self-describing names (VERDICT r4 weak
            # #2): the f32 k=16 scan and the bf16 k=64 scan, both against
            # the 197 TFLOP/s v5e bf16 peak
            "train_mfu_f32_scan16_vs_bf16_peak":
                round(mfu, 4) if mfu else None,
            "train_mfu_bf16_scan64_vs_bf16_peak":
                round(mfu_bf16, 4) if mfu_bf16 else None,
            "p50_latency_ms_64frame_clip_device": round(p50_dev, 2),
            "p50_latency_ms_64frame_clip_device_repeats":
                p50_dev_meta["repeats"],
            "p50_latency_ms_64frame_clip_device_spread":
                p50_dev_meta["spread"],
            "p50_latency_ms_64frame_clip_e2e": round(p50_e2e, 2),
            "serving_frames_per_sec_per_chip_bs32": round(serve_fps, 1),
            "serving_bs32_repeats": serve32_meta["repeats"],
            "serving_bs32_spread": serve32_meta["spread"],
            "serving_bs32_bf16_frames_per_sec_per_chip":
                round(bf16_serve_fps, 1) if bf16_serve_fps is not None
                else None,
            "serving_bs32_bf16_drift_vs_f32":
                round(bf16_serve_drift, 5) if bf16_serve_drift is not None
                else None,
            "serving_bs32_bf16_repeats": bf16_serve_meta.get("repeats"),
            "serving_bs32_bf16_spread": bf16_serve_meta.get("spread"),
            "serving_bs32_int8_frames_per_sec_per_chip":
                round(int8_serve_fps, 1) if int8_serve_fps is not None
                else None,
            "serving_bs32_int8_drift_vs_f32":
                round(int8_serve_drift, 5) if int8_serve_drift is not None
                else None,
            "serving_bs32_int8_repeats": int8_serve_meta.get("repeats"),
            "serving_bs32_int8_spread": int8_serve_meta.get("spread"),
            "serving_bs32_gflops": round(serve_flops / 1e9, 1)
                if serve_flops else None,
            "serving_bs32_achieved_tflops": round(serve_tflops, 1)
                if serve_tflops else None,
            "n_chips": n_chips,
            "reference_frames_per_sec_cpu": round(ref, 1),
            # denominator health (VERDICT r4 item 6): re-measured THIS run
            # in a torch-only subprocess before any device work
            "reference_remeasured_frames_per_sec":
                round(ref_remeasured, 1) if ref_remeasured else None,
            "reference_denominator_diverged_over_10pct": ref_diverged,
            # the headline ratio against TODAY's host (frozen-denominator
            # vs_baseline stays the cross-round contract; this one answers
            # "what if the reference ran on this round's CPU allocation")
            "vs_baseline_remeasured_denominator":
                round(headline_fps / ref_remeasured, 2)
                if ref_remeasured else None,
            # degraded-tunnel canary: healthy ≈3-7 ms/sync; ≈27-32 ms means
            # the transport degraded and per-call sections AFTER that point
            # understate the chip (code is unchanged — see session_rtt_ms)
            "session_rtt_ms_start": rtt_start,
            "session_rtt_ms_before_serving": rtt_serving,
            "session_rtt_ms_end": rtt_end,
            "session_degraded": bool(
                max(rtt_start, rtt_serving, rtt_end) > 15.0),
            **sampling_extras,
            **endpoint_extras,
            **streaming_extras},
    })


if __name__ == "__main__":
    main()
