"""Measure the PyTorch reference's training/inference throughput on CPU.

The reference repo publishes no perf numbers (BASELINE.md), so we measure the
denominator ourselves by importing the reference model code directly from
/root/reference (read-only) and timing it exactly as it trains: float64
(`trainer.py:138`), Adam, grad-clip 1, G-step of the GAN.

The reference depends on the external `pycasper` package (not installed);
we inject a minimal stub with the two symbols the model code needs.

Usage: python benchmarks/bench_reference.py [--batch-size 32] [--iters 10]
Writes results to benchmarks/reference_cpu.json.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import torch

# ---------------------------------------------------------------------------
# pycasper stub (API per SURVEY.md §1.1)
# ---------------------------------------------------------------------------

pycasper = types.ModuleType("pycasper")
torchUtils = types.ModuleType("pycasper.torchUtils")


@contextlib.contextmanager
def some_grad(module):
    flags = [p.requires_grad for p in module.parameters()]
    for p in module.parameters():
        p.requires_grad = False
    try:
        yield
    finally:
        for p, f in zip(module.parameters(), flags):
            p.requires_grad = f


class LambdaScheduler:
    def __init__(self, lambdas, kind="incremental", max_interval=300,
                 max_lambda=2):
        self.lambdas = list(lambdas)

    def step(self):
        return self.lambdas


torchUtils.some_grad = some_grad
torchUtils.LambdaScheduler = LambdaScheduler
pycasper.torchUtils = torchUtils
sys.modules["pycasper"] = pycasper
sys.modules["pycasper.torchUtils"] = torchUtils

# Load the reference model modules directly (the package __init__ drags in
# trainer.py whose deps — old transformers API, librosa, full pycasper — are
# not installed; the model files themselves only need torch).
import importlib.util  # noqa: E402

_REF = "/root/reference/src/model"
_pkg = types.ModuleType("refmodel")
_pkg.__path__ = [_REF]
sys.modules["refmodel"] = _pkg


def _load(name):
    spec = importlib.util.spec_from_file_location(f"refmodel.{name}",
                                                  f"{_REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refmodel.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


_load("layers")
_s2g = _load("speech2gesture")
_jl = _load("joint_late_cluster_soft_style")
_gan = _load("gan")
JointLateClusterSoftStyle4_G = _jl.JointLateClusterSoftStyle4_G
Speech2Gesture_D = _s2g.Speech2Gesture_D
Speech2Gesture_G = _s2g.Speech2Gesture_G
GAN = _gan.GAN


def bench_mixstage_train(batch_size=32, iters=10, num_speakers=8,
                         num_clusters=8):
    T, MEL, FEATS = 64, 128, 96
    torch.manual_seed(0)
    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    style_dict = {f"sp{i}": i for i in range(num_speakers)}
    G = JointLateClusterSoftStyle4_G(time_steps=T, out_feats=FEATS,
                                     num_clusters=num_clusters,
                                     style_dict=style_dict, shape=shape)
    D = Speech2Gesture_D(in_channels=FEATS)
    model = GAN(G, D, dg_iter_ratio=0.0, criterion="L1Loss",
                input_modalities=["audio/log_mel_512"]).double()
    model.train(True)
    g_optim = torch.optim.Adam(model.G.parameters(), lr=1e-4)

    audio = torch.randn(batch_size, T, MEL, dtype=torch.float64)
    labels = torch.randint(0, num_clusters, (batch_size, T))
    y = torch.randn(batch_size, T, FEATS, dtype=torch.float64)
    style = torch.randint(0, num_speakers, (batch_size, 1)).repeat(1, T)
    kwargs = dict(input_modalities=["audio/log_mel_512"], style=style,
                  sample_flag=0, description="train", epoch=0)

    def step():
        g_optim.zero_grad()
        y_cap, internal_losses, *_ = model([audio, labels], y, **kwargs)
        loss = sum(internal_losses)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.G.parameters(), 1)
        g_optim.step()

    step()  # warmup (also flips curriculum RNG states)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"median_step_sec": dt,
            "frames_per_sec": batch_size * T / dt,
            "batch_size": batch_size}


def bench_mixstage_infer(iters=20, num_speakers=8, num_clusters=8):
    T, MEL, FEATS = 64, 128, 96
    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    style_dict = {f"sp{i}": i for i in range(num_speakers)}
    G = JointLateClusterSoftStyle4_G(time_steps=T, out_feats=FEATS,
                                     num_clusters=num_clusters,
                                     style_dict=style_dict,
                                     shape=shape).double().eval()
    audio = torch.randn(1, T, MEL, dtype=torch.float64)
    labels = torch.randint(0, num_clusters, (1, T))
    y = torch.randn(1, T, FEATS, dtype=torch.float64)
    style = torch.zeros(1, T, dtype=torch.long)
    kwargs = dict(input_modalities=["audio/log_mel_512"], style=style,
                  sample_flag=1, description="test", epoch=0)
    with torch.no_grad():
        G([audio, labels], y, **kwargs)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            G([audio, labels], y, **kwargs)
            times.append(time.perf_counter() - t0)
    return {"p50_latency_sec": float(np.median(times))}


def bench_s2g_train(batch_size=32, iters=10):
    T, MEL, FEATS = 64, 128, 96
    model = Speech2Gesture_G(time_steps=T, out_feats=FEATS).double().train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-4)
    audio = torch.randn(batch_size, T, MEL, dtype=torch.float64)
    y = torch.randn(batch_size, T, FEATS, dtype=torch.float64)

    def step():
        optim.zero_grad()
        y_cap, internal = model(audio, y)
        loss = torch.nn.functional.l1_loss(y_cap, y)
        loss.backward()
        optim.step()

    step()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"median_step_sec": dt, "frames_per_sec": batch_size * T / dt}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--freeze", action="store_true",
                    help="overwrite reference_cpu.json (the frozen "
                         "vs_baseline denominator contract); without it, "
                         "results go to reference_cpu_latest.json so a "
                         "routine health re-measure cannot silently move "
                         "the cross-round denominator")
    args = ap.parse_args()
    torch.set_num_threads(torch.get_num_threads())
    results = {
        "torch_threads": torch.get_num_threads(),
        "mixstage_gan_train_bs32": bench_mixstage_train(args.batch_size,
                                                        args.iters),
        "mixstage_infer_clip": bench_mixstage_infer(),
        "s2g_train_bs32": bench_s2g_train(args.batch_size, args.iters),
    }
    name = "reference_cpu.json" if args.freeze else "reference_cpu_latest.json"
    out = Path(__file__).parent / name
    json.dump(results, open(out, "w"), indent=2)
    print(json.dumps(results, indent=2))
