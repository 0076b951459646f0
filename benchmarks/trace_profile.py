"""Device-trace profiler for the fused scan training step (VERDICT r2 item 2).

Captures a ``jax.profiler`` trace around the production k-step scan driver on
the real chip, then parses the TensorBoard trace protobuf JSON into a
per-HLO-op *self-time* breakdown (children subtracted), classifies every op
into a model subsystem by its output shapes, and reports:

* per-subsystem ms/step and share,
* the top individual ops with achieved HBM bandwidth (bytes_accessed/dur),
* lane-padding diagnostics: time spent in ops whose minor-most dim < 128
  (v5e vector lanes), i.e. structurally bandwidth-wasting layouts.

Usage:  python benchmarks/trace_profile.py [--k 64] [--steps 3] [--out JSON]

This is the measurement tool behind docs/STATUS.md "Perf analysis (round 3)"
— the evidence that the remaining bs32 gap is op-shape-structural (audio
encoder C=64 lane padding + BN reduction barriers), not scheduling overhead.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def capture(k: int, calls: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import bench_scan, build

    factory = build(jnp.bfloat16, donate=True)
    _, scan_fn, (state, stacked, coins, rngs) = bench_scan(
        factory, 32, k, chain=3, reps=1)
    jax.profiler.start_trace(trace_dir)
    losses = None
    for _ in range(calls):
        state, losses, _ = scan_fn(state, stacked, coins, rngs)
    # force the device work into the trace window (block_until_ready is a
    # no-op through the tunnel — fetch a scalar instead)
    float(np.asarray(losses["total"][-1]))
    jax.profiler.stop_trace()


def load_events(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    tpu_pid = next(e["pid"] for e in evs
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"]["name"])
    ops_tid = next(e["tid"] for e in evs
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e["pid"] == tpu_pid and e["args"]["name"] == "XLA Ops")
    return [e for e in evs if e.get("ph") == "X" and e["pid"] == tpu_pid
            and e["tid"] == ops_tid]


def self_times(evs):
    """Per-op-name self duration (nested children subtracted) + metadata.

    Self time is computed per EVENT (duration minus the durations of its
    direct children on the nesting stack, floored at 0) and then aggregated
    by op name — name-keyed subtraction goes negative when instances of one
    name appear at different nesting depths."""
    evs = sorted(evs, key=lambda e: (e["ts"], -e.get("dur", 0)))
    self_t = collections.Counter()
    meta = {}
    stack = []  # entries: [ts, dur, name, child_time]
    def flush(entry):
        self_t[entry[2]] += max(entry[1] - entry[3], 0)
    for e in evs:
        ts, dur, n = e["ts"], e.get("dur", 0), e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            flush(stack.pop())
        if stack:
            stack[-1][3] += dur
        if n not in meta:
            a = e.get("args", {})
            meta[n] = {"long_name": a.get("long_name", ""),
                       "bytes": int(a.get("bytes_accessed", 0) or 0),
                       "category": a.get("hlo_category", "?"),
                       "count": 0}
        meta[n]["count"] += 1
        stack.append([ts, dur, n, 0])
    while stack:
        flush(stack.pop())
    return self_t, meta


_SHAPE = re.compile(r"(?:bf16|f32|f64|s32|s8|pred|u32)\[([\d,]+)\]")


def classify(long_name: str) -> str:
    """Subsystem by output/operand shapes (flagship 8-cluster model at bs32):
    grouped (…,8,256) tensors = mixture decoder; 4-D activations = the 2-D
    audio-encoder pyramid; (32,64,C) = 1-D pose/UNet/disc path."""
    score = collections.Counter()
    for s in _SHAPE.findall(long_name):
        d = s.split(",")
        if ",8,256" in "," + s or s in ("3,266,8,256", "3,256,8,256",
                                        "8,256,96", "8,96,256"):
            score["decoder"] += 1
        elif len(d) == 4 and int(d[0]) == 32:
            score["audio2d"] += 1
        elif len(d) == 4:
            score["audio2d_w"] += 1          # 2-D conv kernels / their grads
        elif len(d) == 3 and d[0] == "32":
            score["pose1d"] += 1
    if not score:
        return "other"
    best = score.most_common(1)[0][0]
    return "audio2d" if best == "audio2d_w" else best


# audio-pyramid attribution for the flagship bs32 model (kernel shapes are
# unique per conv layer; activation shapes map post-conv fusions/BNs to the
# producing layer — (32,8,16,256) is shared by conv5-out/conv6 so it reports
# as the combined bucket 'L5/6')
_AUDIO_KERNELS = {"3,3,1,64": "L0", "4,4,64,64": "L1", "3,3,64,128": "L2",
                  "4,4,128,128": "L3", "3,3,128,256": "L4",
                  "4,4,256,256": "L5", "3,3,256,256": "L6",
                  "3,8,256,256": "L7"}
_AUDIO_ACTS = {"32,64,128,64": "L0", "32,32,64,64": "L1",
               "32,32,64,128": "L2", "32,16,32,128": "L3",
               "32,16,32,256": "L4", "32,8,16,256": "L5/6",
               "32,8,15,256": "L7",
               # space-to-depth folded forms (lowerings='s2d'/'im2col')
               "32,33,65,256": "L1", "32,17,33,512": "L3",
               "32,9,17,1024": "L5", "32,64,128,9": "L0",
               "32,8,16,2304": "L6", "32,8,22,256": "L7",
               "2,2,256,64": "L1", "2,2,512,128": "L3", "2,2,1024,256": "L5"}


def audio_layer(long_name: str):
    shapes = _SHAPE.findall(long_name)
    for s in shapes:
        if s in _AUDIO_KERNELS:
            return _AUDIO_KERNELS[s]
    hits = [_AUDIO_ACTS[s] for s in shapes if s in _AUDIO_ACTS]
    if hits:
        # most specific = the layer of the op's OUTPUT (first shape in the text)
        return hits[0]
    return None


# fwd conv GFLOPs per audio layer at bs32 (2*B*Ho*Wo*kh*kw*Cin*Cout);
# fwd+bwd ≈ 3x (dW + dX, except L0's dX is unused).  For per-layer MFU.
_AUDIO_GFLOP_FWD = {"L0": 0.302, "L1": 17.18, "L2": 9.66, "L3": 8.59,
                    "L4": 9.66, "L5": 8.59, "L6": 4.83,
                    "L5/6": 8.59 + 4.83, "L7": 12.08}


def minor_dim_lt_128(long_name: str) -> bool:
    """True if the op's OUTPUT layout puts a <128 dim minor-most (half the
    v5e vector lanes idle; HBM tiles padded 2x)."""
    m = re.search(r"\[([\d,]+)\]\{(\d+)[,:}]", long_name.split(" = ")[-1])
    if not m:
        return False
    dims = m.group(1).split(",")
    minor = int(m.group(2))
    return minor < len(dims) and int(dims[minor]) < 128


def analyze(evs, n_steps: int):
    self_t, meta = self_times(evs)
    total = sum(d for d in self_t.values() if d > 0)
    sub = collections.Counter()
    audio = collections.Counter()
    lane_waste = 0
    rows = []
    for n, d in self_t.items():
        if d <= 0:
            continue
        ln = meta[n]["long_name"]
        c = classify(ln)
        sub[c] += d
        if c == "audio2d":
            audio[audio_layer(ln) or "unattributed"] += d
        if minor_dim_lt_128(ln):
            lane_waste += d
        per_exec = d / max(meta[n]["count"], 1)
        bw = (meta[n]["bytes"] / (per_exec * 1e-6) / 1e9
              if meta[n]["bytes"] and per_exec else None)
        rows.append({"op": n, "us_per_step": round(d / n_steps, 2),
                     "subsystem": c, "category": meta[n]["category"],
                     "achieved_GBps": round(bw, 1) if bw else None,
                     "minor_dim_lt_128": minor_dim_lt_128(ln)})
    rows.sort(key=lambda r: -r["us_per_step"])
    return {
        "ms_per_step_total": round(total / n_steps / 1e3, 4),
        "subsystem_ms_per_step": {k: round(v / n_steps / 1e3, 4)
                                  for k, v in sub.most_common()},
        "subsystem_share": {k: round(v / total, 3)
                            for k, v in sub.most_common()},
        "lane_padded_ms_per_step": round(lane_waste / n_steps / 1e3, 4),
        "lane_padded_share": round(lane_waste / total, 3),
        # per-audio-layer self time + bf16 MFU (fwd+bwd ≈ 3x fwd GFLOPs;
        # v5e peak 197 TFLOP/s) — names the sink layers precisely
        "_audio_attribution_note": (
            "Layer buckets are attribution-blurred one layer leftward: a "
            "dL/dx conv of layer i+1 OUTPUTS layer i's activation shape, so "
            "it lands in bucket i.  MFU >100% in a bucket means its ops "
            "borrowed from the neighbour; read pairs jointly."),
        "audio_layer_us_per_step": {k: round(v / n_steps, 1)
                                    for k, v in audio.most_common()},
        "audio_layer_mfu_pct": {
            k: round(100 * 3 * _AUDIO_GFLOP_FWD[k]
                     / ((v / n_steps) * 1e-6) / 197e3, 1)
            for k, v in audio.most_common() if k in _AUDIO_GFLOP_FWD},
        "top_ops": rows[:25],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "trace_profile.json")
    ap.add_argument("--trace-dir", default=None,
                    help="parse an existing trace dir instead of capturing")
    ns = ap.parse_args()
    trace_dir = ns.trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    if not ns.trace_dir:
        capture(ns.k, ns.calls, trace_dir)
    n_steps = ns.calls * ns.k
    report = analyze(load_events(trace_dir), n_steps)
    report["k"] = ns.k
    report["n_steps_traced"] = n_steps
    ns.out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "top_ops"},
                     indent=2))
    print(f"full report -> {ns.out}")


if __name__ == "__main__":
    main()
