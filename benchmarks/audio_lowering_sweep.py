"""In-graph sweep of audio-encoder conv lowering plans (VERDICT r3 item 2).

Measures the REAL fwd+bwd cost of the full 8-layer audio conv pyramid
(convs + BNs + leaky-relus, training mode, bf16) under a k-iteration
``lax.scan`` whose carry is the parameter pytree — the same
params-as-carry regime as the production scan driver — using the
differential chain timing from bench.py (the only trustworthy timing
through the axon tunnel; see CLAUDE.md).

Usage: python benchmarks/audio_lowering_sweep.py [--plans base,s2d,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

PLANS = {
    "base":    None,
    "s2d":     ("conv", "s2d", "conv", "s2d", "conv", "s2d", "conv", "conv"),
    "im2col0": ("im2col",) + ("conv",) * 7,
    "im2col067": ("im2col", "conv", "conv", "conv", "conv", "conv", "im2col", "im2col"),
    "s2d+i0":  ("im2col", "s2d", "conv", "s2d", "conv", "s2d", "conv", "conv"),
    "all":     ("im2col", "s2d", "im2col", "s2d", "im2col", "s2d", "im2col", "im2col"),
}


def bench_plan(plan, B=32, k=24, chain=8, reps=3, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from bench import marginal_time
    from mixstage_tpu.models.layers import AudioEncoder

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    enc = AudioEncoder(output_feats=64, lowerings=plan, dtype=dt)
    x = jax.random.normal(jax.random.key(0), (B, 64, 128), dtype=dt)
    v = enc.init(jax.random.key(1), x, train=False)
    params, stats = v["params"], v["batch_stats"]

    def loss_fn(params, stats, x):
        y, upd = enc.apply({"params": params, "batch_stats": stats}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2), upd["batch_stats"]

    grad_fn = jax.grad(loss_fn, has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, x):
        def body(carry, _):
            params, stats = carry
            g, stats = grad_fn(params, stats, x)
            # sgd-flavoured touch so params-carry relayout cost is included
            params = jax.tree.map(lambda p, gg: p - 1e-9 * gg.astype(p.dtype),
                                  params, g)
            return (params, stats), ()
        carry, _ = jax.lax.scan(body, carry, None, length=k)
        return carry

    holder = {"c": (params, stats)}

    def run_chain(n):
        for _ in range(n):
            holder["c"] = run(holder["c"], x)
        return jax.tree.leaves(holder["c"][0])[0].reshape(-1)[0]

    run_chain(1)  # compile
    sec = marginal_time(run_chain, n=chain, reps=reps)
    # per-iteration FLOPs from a scan-free lowering of one fwd+bwd (XLA's
    # cost analysis counts a scan body ONCE regardless of trip count, so
    # lowering `run` and dividing by k would undercount by k)
    flops = None
    try:
        one = jax.jit(lambda p, s, x: grad_fn(p, s, x))
        cost = one.lower(holder["c"][0], holder["c"][1], x).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:  # noqa: BLE001
        pass
    return sec / k, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=",".join(PLANS))
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    ns = ap.parse_args()
    out = {}
    peak = 197e12 if ns.dtype == "bfloat16" else 98.5e12  # v5e
    for name in ns.plans.split(","):
        sec, flops = bench_plan(PLANS[name], k=ns.k, dtype=ns.dtype)
        us = sec * 1e6
        entry = {"us_per_iter": round(us, 1)}
        if flops:
            entry["gflop_per_iter"] = round(flops / 1e9, 1)
            entry["achieved_tflops"] = round(flops / sec / 1e12, 1)
            entry["mfu_pct"] = round(100 * flops / sec / peak, 1)
        out[name] = entry
        print(f"{name:10s}: {us:8.1f} us/iter  "
              + (f"{entry.get('achieved_tflops', '?')} TFLOP/s "
                 f"({entry.get('mfu_pct', '?')}% MFU)" if flops else "")
              + f"  (audio-enc fwd+bwd bs32 {ns.dtype})",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
