"""Render-path benchmark: native C++ rasterizer vs the matplotlib path.

The reference's renderer (animation.py:101-249, matplotlib FuncAnimation →
ffmpeg/Pillow) is the slowest host subsystem; `save_animation` fans it out
with joblib threads but the Agg draw holds the GIL.  This measures both
backends on the same clip (one interval-sized pose sequence, 52 joints) and
writes benchmarks/render_bench.json.

Run:  python benchmarks/render_bench.py  [--frames 64]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


class _FakeData:
    path2data = "/nonexistent"

    def getSpeaker(self, interval_id):
        return "oliver"


def bench_backend(backend: str, y, parents, frames: int) -> dict:
    from mixstage_tpu.animation.animation import animate

    os.environ["MIXSTAGE_RENDER_BACKEND"] = backend
    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        out = animate(y, "0", parents, d, "bench", _FakeData(),
                      None, None, 0, None, fps=15)
        wall = time.perf_counter() - t0
        size = os.path.getsize(out)
    return {"wall_s": round(wall, 2),
            "frames_per_sec": round(frames / wall, 2),
            "file_bytes": size}


def bench_raster_only(y, parents, frames: int, repeats: int = 5) -> dict:
    """Rasterization alone (no GIF encode) — the C++ kernel's own rate."""
    from mixstage_tpu.animation import raster

    raster.rasterize(y, parents)  # warm-up (lib load)
    t0 = time.perf_counter()
    for _ in range(repeats):
        raster.rasterize(y, parents)
    wall = (time.perf_counter() - t0) / repeats
    return {"wall_s": round(wall, 3),
            "frames_per_sec": round(frames / wall, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    from mixstage_tpu.data.skeleton import PARENTS

    rng = np.random.default_rng(0)
    y = np.cumsum(rng.normal(size=(args.frames, 2, 52)), 0) * 10

    results = {"frames": args.frames, "joints": 52, "panel_px": 480}
    results["raster_kernel"] = bench_raster_only(y, PARENTS, args.frames)
    results["native"] = bench_backend("native", y, PARENTS, args.frames)
    results["matplotlib"] = bench_backend("matplotlib", y, PARENTS,
                                          args.frames)
    results["speedup_end_to_end"] = round(
        results["matplotlib"]["wall_s"] / results["native"]["wall_s"], 1)
    out = Path(__file__).parent / "render_bench.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
