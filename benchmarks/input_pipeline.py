"""Host input-pipeline throughput: can the 1-core host feed the chip?

Measures the full host-side batch path the trainer actually runs — DataLoader
windowing/collate (h5-backed MiniData, C++ bulk assembler where applicable)
followed by ``Trainer.get_processed_batch`` (KMeans labels, ZNorm, joint
masking, device staging arrays) — with no device steps, i.e. the producer
side of ``train/prefetch.py``.

Reference counterpart: the torch DataLoader + ``get_processed_batch``
(trainer.py:590-618), which the reference runs synchronously in-loop.

Run standalone on the CPU backend:

    python benchmarks/input_pipeline.py

Writes benchmarks/input_pipeline.json and prints a summary.  The point of
the number: the TPU consumes ~800k frames/s at bs32 (BENCH_r02), so on this
container's single host core the steady-state pipeline is host-bound — the
measurement quantifies by how much, and the json records the per-stage
split (dataloader vs transform) so the parallelism story (N worker threads
on a real TPU-VM host; the pipeline is per-batch independent) is concrete.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def main():
    import jax

    if jax.default_backend() != "cpu":
        raise SystemExit("run with the CPU backend (the bench host path); "
                         "use jax.config.update('jax_platforms','cpu')")

    from mixstage_tpu.config import config_from_dict
    from mixstage_tpu.data.synthetic import make_synthetic_dataset
    from mixstage_tpu.train.trainer import Trainer

    data_dir = "/tmp/bench_pipeline_pats_v2"
    if not (Path(data_dir) / "cmu_intervals_df.csv").exists():
        make_synthetic_dataset(data_dir, ["oliver", "maher"],
                               num_intervals_per_speaker=60)
    cfg = config_from_dict(dict(
        path2data=data_dir, speaker=["oliver", "maher"],
        modalities=["pose/data", "audio/log_mel_512"], fs_new=[15, 15],
        batch_size=32, window_hop=5, save_dir="/tmp/bench_pipeline_save",
        exp=91, model="JointLateClusterSoftStyle4_G", gan=1, loss="L1Loss",
        num_clusters=8, metrics=0, render=0))
    tr = Trainer(cfg, ["exp", "cpk", "speaker", "model", "note"], {})

    # warm pass (h5 page cache, kmeans/znorm caches, numpy allocs)
    loader = tr.data_train
    for b in loader:
        tr.get_processed_batch(b)

    # measured pass, stage-attributed; repeat epochs until the sample is
    # large enough for a stable mean (the synthetic fixture is small)
    t_load = t_proc = 0.0
    frames = batches = 0
    t_epoch0 = time.perf_counter()
    while time.perf_counter() - t_epoch0 < 3.0 or batches < 50:
        it = iter(loader)
        while True:
            t0 = time.perf_counter()
            try:
                b = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            sb = tr.get_processed_batch(b)[0]
            t2 = time.perf_counter()
            t_load += t1 - t0
            t_proc += t2 - t1
            B, T = sb["y"].shape[0], sb["y"].shape[1]
            frames += B * T
            batches += 1
    wall = time.perf_counter() - t_epoch0

    fps = frames / wall
    out = {
        "host_pipeline_frames_per_sec_1core": round(fps, 1),
        "host_pipeline_batches_per_sec": round(batches / wall, 2),
        "dataloader_ms_per_batch": round(t_load / batches * 1e3, 2),
        "processing_ms_per_batch": round(t_proc / batches * 1e3, 2),
        "batches": batches,
        "batch_size": 32,
        "frames": frames,
        "wall_s": round(wall, 2),
        "note": "full host batch path (DataLoader windowing/collate + "
                "get_processed_batch), single core, no device steps; "
                "per-batch independent so it thread-scales with host cores",
    }
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
