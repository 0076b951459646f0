"""Whole-interval sampling + cross-speaker style transfer.

Parity target: ``sample``/``sample_loop`` (reference
``/root/reference/src/model/trainer.py:705-849``): iterate per-interval
datasets, run each interval as ONE batch-1 full-length sequence (the nets are
fully convolutional), enumerate style-transfer targets via ``update_kwargs``
(trainer.py:1367-1386), update label histograms and the per-style-pair metric
stacks, and dump predicted keypoints to ``keypoints[_name]/<split>/<speaker>/
<interval>.h5``.

TPU twist: XLA wants static shapes, so interval lengths are bucketed — the
window count is padded up to the next power of two (≤ 7 compiled variants per
split instead of one per unique interval length) and outputs are trimmed.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from mixstage_tpu.data.dataset import DataLoader
from mixstage_tpu.ops.bucketing import next_pow2, pad_repeat_last
from mixstage_tpu.parallel.parallel import parallel


class _MetricWorker:
    """Runs the host-side metric cascade on a single background thread so it
    overlaps the NEXT interval's TPU dispatch/compute (VERDICT r2 item 3).

    One worker, FIFO queue → metric-update order is identical to the inline
    path, so streaming FID moments / W1 histograms / label histograms (and
    therefore the bit-determinism contract) are unchanged.  ``busy_s``
    accumulates time spent in metric math for the overlap measurement."""

    def __init__(self, maxsize: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._exc: Optional[BaseException] = None
        self.busy_s = 0.0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import time

        while True:
            item = self._q.get()
            if item is None:
                return
            if self._exc is not None:
                continue  # drain after failure
            fn, args, kwargs = item
            t0 = time.perf_counter()
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                self._exc = e
            finally:
                self.busy_s += time.perf_counter() - t0

    def submit(self, fn, *args, **kwargs):
        if self._exc is not None:
            self.join()
        self._q.put((fn, args, kwargs))

    def join(self):
        self._q.put(None)
        self._thread.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def _flatten_windows(step_batch: Dict, pad_to: int) -> Dict:
    """(B, T, ...) windows → one (1, B*T, ...) sequence, padding the window
    count to ``pad_to`` by repeating the last window (ops.bucketing: the
    same bucket-choice + pad-fill pair serving uses — one copy)."""
    out = {}
    for key, val in step_batch.items():
        if key == "x":
            out["x"] = tuple(_flatten_one(np.asarray(v), pad_to) for v in val)
        else:
            out[key] = _flatten_one(np.asarray(val), pad_to)
    return out


def _flatten_one(v: np.ndarray, pad_to: int) -> np.ndarray:
    v = pad_repeat_last(v, pad_to)
    if v.ndim == 3:
        return v.reshape(1, -1, v.shape[-1])
    return v.reshape(1, -1)


def sample_loop(trainer, desc: str):
    trainer.metrics_reset()
    datasets = trainer.data.datasets[desc].datasets
    running, running_count = {"pose": 0.0}, [1e-10]
    filenames, keys, y_outs = [], [], []
    collate_fn = trainer.data.dataLoader_kwargs.get("collate_fn")
    worker = _MetricWorker()

    def host_side(losses, y_cap, aux, pad_to, T, B, y_, insert,
                  kwargs_name, style_id, style_target, fname, flush):
        """Everything downstream of the TPU eval step: fetch, label
        histogram, loss accumulation, metric cascade, dump batching.  Runs
        on the metric worker thread, in dispatch order."""
        trainer._update_labels(aux.get("labels_cap_soft"), desc,
                               style=style_id, kwargs_name=kwargs_name)
        y_cap = np.asarray(y_cap, np.float64).reshape(pad_to, T, -1)[:B]
        running["pose"] += float(losses["pose"]) * B
        running_count[0] += B
        metric_kwargs = ({"style": np.asarray(style_target)}
                         if trainer.step_cfg.has_style else {})
        y_cap_out = trainer.calculate_metrics(y_cap, y_, kwargs_name,
                                              insert=insert, **metric_kwargs)
        filenames.append(fname)
        keys.append(trainer.output_modality)
        y_outs.append(y_cap_out)  # (B*T, 2, joints) raw, root-zeroed
        if flush:
            parallel(
                trainer.data.modality_classes[trainer.output_modality].append,
                -1, filenames, keys, y_outs)
            filenames.clear(), keys.clear(), y_outs.clear()

    import time

    len_data = len(datasets)
    interval_times = []
    for count, minidata in enumerate(datasets):
        t_interval = time.perf_counter()
        Y_gt = trainer.get_gt(minidata.path2h5)
        if len(minidata) == 0:
            continue
        loader = DataLoader(minidata, batch_size=len(minidata), shuffle=False,
                            collate_fn=collate_fn)
        batch = next(iter(loader))
        step_batch, y_, insert = trainer.get_processed_batch(batch)
        step_batch = {k: (tuple(np.asarray(v) for v in val)
                          if k == "x" else np.asarray(val))
                      for k, val in step_batch.items()}
        B, T = y_.shape[0], y_.shape[1]
        pad_to = next_pow2(B)
        flat = _flatten_windows(step_batch, pad_to)

        interval_id = batch["meta"]["interval_id"][0]
        speaker = trainer.data.getSpeaker(interval_id)
        orig_style = flat.get("style")
        style_id = int(np.asarray(batch["style"]).reshape(-1)[0]) \
            if "style" in batch else 0

        for style_target, kwargs_name in trainer.update_kwargs_styles(
                orig_style if orig_style is not None else np.zeros((1, 1))):
            fb = dict(flat)
            if trainer.step_cfg.has_style:
                if isinstance(style_target, str) and style_target == "__mix__":
                    S = trainer.step_cfg.num_speakers
                    fb["style_soft"] = np.full(
                        flat["style"].shape + (S,), 1.0 / S)
                    style_target = orig_style
                fb["style"] = np.asarray(style_target, np.int32)
            from mixstage_tpu.parallel.mesh import shard_batch

            fb = shard_batch(fb, trainer.mesh)
            # dispatch is async: the worker fetches + runs the metric math
            # while the NEXT interval's eval computes on the TPU
            losses, y_cap, aux = trainer.steps["eval"](
                trainer.state, fb, use_pose_input=False, sample_flag=True)
            dir_name = "keypoints" if kwargs_name is None \
                else f"keypoints_{kwargs_name}"
            fname = (Path(trainer.dir_name) / dir_name / desc
                     / speaker / f"{interval_id}.h5").as_posix()
            flush = (count + 1) % 100 == 0 or count == len_data - 1
            worker.submit(host_side, losses, y_cap, aux, pad_to, T, B, y_,
                          insert, kwargs_name, style_id, style_target, fname,
                          flush)
        interval_times.append(time.perf_counter() - t_interval)

    worker.join()
    # overlap diagnostics for bench.py: host metric-math seconds + the main
    # loop's per-interval dispatch times (excludes the final drain)
    trainer._sample_metric_overlap_s = worker.busy_s
    trainer._sample_interval_times = interval_times
    loss_avg = running["pose"] / running_count[0]
    if trainer.args.metrics:
        metrics, metrics_split = trainer.get_metrics(desc)
    else:
        metrics, metrics_split = {}, {}
    return loss_avg, metrics, metrics_split
