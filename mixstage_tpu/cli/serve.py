"""Serving CLI — restore a checkpointed experiment and serve audio→pose
over HTTP with dynamic batching.

TPU-native addition (no reference counterpart; the reference's only
inference surface is the offline sample loop, trainer.py:705-849).

  python -m mixstage_tpu.cli.serve -load <PREFIX_weights.p> \
      -path2data <data> -batch_size 32 -serve_port 8008

Endpoints: POST /v1/pose (JSON {"audio": (T, mel), "style": id} or npz
octet-stream), GET /healthz, GET /stats.  The jitted graph has a static
batch; the DynamicBatcher pads partial micro-batches (see
mixstage_tpu/serving/server.py).

``-serve_int8 1`` serves the int8-quantized mixture decoder
(ops/pallas/quant.py; ~2x MXU rate on v5e), calibrated on one real data
batch at startup — an opt-in accuracy tier with a few percent drift.
"""

from __future__ import annotations

from mixstage_tpu.config import Config, argparse_n_loop


def resolve_partition(partition, n_dev: int, batch: int):
    """CLI multi-chip layout resolution (-serve_partition).

    'batch' DP only engages when the static batch divides the device count
    (otherwise a padded micro-batch could not shard); 'time'/'expert' take
    the mesh regardless — their sharding does not depend on the batch.
    Returns (effective_partition, use_mesh); on a single device every
    (valid) partition collapses to the plain single-chip path.  Unknown
    values raise HERE, not only on multi-chip hosts — a typo'd flag must
    not silently ship batch mode on the 1-device box and then crash on the
    pod.
    """
    partition = str(partition or "batch")
    if partition not in ("batch", "time", "expert"):
        raise ValueError(f"unknown -serve_partition {partition!r}; "
                         "expected 'batch', 'time' or 'expert'")
    use_mesh = n_dev > 1 and (partition != "batch" or batch % n_dev == 0)
    return (partition if use_mesh else "batch"), use_mesh


def _calib_windows(trainer, n_batches: int, batch_size: int = 8):
    """Pool several real loader windows into one int8 calibration batch.

    Static activation scales clip everything above the calibration maxima,
    so the sample should cover the activation distribution — a single
    2-sample peek under-estimates per-layer maxima (ADVICE r3).  The loader
    iteration itself is ``Trainer.peek_batches`` (one copy, shared with
    model init)."""
    import numpy as np

    xs, stys = [], []
    for cb in trainer.peek_batches(n_batches, batch_size=batch_size):
        xs.append(np.asarray(cb["x"][0], np.float32))
        stys.append(np.asarray(cb["style"][:, 0], np.int32)
                    if "style" in cb
                    else np.zeros((cb["x"][0].shape[0],), np.int32))
    return np.concatenate(xs), np.concatenate(stys)


def loop(args: Config, exp_num: int):
    assert args.load or args.export_dir, \
        "pass -load <PREFIX_weights.p> or -export_dir <artifact>"
    import jax
    import numpy as np

    from mixstage_tpu.serving import (DynamicBatcher, PoseService,
                                      start_http_server)

    wav_batcher = None
    mel_bins = static_frames = None
    if args.export_dir and not args.load:
        # serve straight from an AOT artifact — no checkpoint, no model code
        from mixstage_tpu.export import load_serving

        serve_fn = load_serving(args.export_dir)
        batch = serve_fn.static_batch
        num_styles = serve_fn.manifest["num_speakers"]
        wait_ms = float(args.serve_wait_ms or 5.0)
        mel_bins = int(serve_fn.manifest["mel"])
        static_frames = int(serve_fn.frames)  # the AOT graph's T is static
    else:
        from mixstage_tpu.config import get_args_update_dict
        from mixstage_tpu.serve import build_serving_fn
        from mixstage_tpu.train.trainer import Trainer

        update = get_args_update_dict(args)
        update["window_hop"] = 0
        update["render"] = 0
        trainer = Trainer(args, ["exp", "cpk", "speaker", "model", "note"],
                          update)
        batch = int(trainer.args.batch_size or 32)
        # multi-chip: -serve_partition picks the layout (batch DP by
        # default; 'time'/'expert' for shapes batch sharding cannot split —
        # serve.build_serving_fn partition modes)
        mesh = None
        partition, use_mesh = resolve_partition(
            getattr(trainer.args, "serve_partition", None),
            len(jax.devices()), batch)
        if use_mesh:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("data",))
        mel_bins = int(trainer._peek_batch()["x"][0].shape[-1])
        quant_kw = {}
        if getattr(trainer.args, "serve_int8", 0):
            # activation calibration pooled over several real loader windows
            # (static per-layer scales — quant.py; a single 2-sample peek
            # under-estimates activation maxima and over-clips live traffic)
            n_cal = int(getattr(trainer.args, "serve_calib_batches", 0) or 8)
            quant_kw = {"quantize_int8": True,
                        "calib": _calib_windows(trainer, n_cal)}
        serve_fn = build_serving_fn(trainer.factory, trainer.state, mesh=mesh,
                                    partition=partition, **quant_kw)
        num_styles = trainer.factory.cfg.num_speakers
        wait_ms = float(getattr(trainer.args, "serve_wait_ms", None) or 5.0)

    def run(audio, style):
        return serve_fn(audio, np.asarray(style))

    max_queue = int(args.serve_max_queue or 0) or None
    batcher = DynamicBatcher(run, batch_size=batch, max_wait_ms=wait_ms,
                             input_shape=(static_frames, mel_bins),
                             max_queue=max_queue)
    # raw-16kHz endpoint when the model consumes the log_mel_400 frontend
    # (checkpoint mode only; artifacts currently export the mel-input graph)
    if args.load and \
            "audio/log_mel_400" in trainer.factory.cfg.input_modalities:
        from mixstage_tpu.serve import build_waveform_serving_fn

        wav_fn = build_waveform_serving_fn(trainer.factory, trainer.state)
        wav_batcher = DynamicBatcher(
            lambda a, s: wav_fn(a, np.asarray(s)), batch_size=batch,
            max_wait_ms=wait_ms, input_shape=(None,), max_queue=max_queue)
    frames = int(getattr(serve_fn, "frames", 0) or 64)
    service = PoseService(batcher, backend=jax.default_backend(),
                          num_styles=num_styles,
                          waveform_batcher=wav_batcher, frames=frames,
                          mel_bins=mel_bins, static_frames=static_frames,
                          # 0/unset falls back to the 4096 default by
                          # contract (config.py flag help): the cap bounds
                          # the compiled-bucket set and cannot be disabled
                          max_frames=int(args.serve_max_frames or 0) or 4096)
    port = int(args.serve_port or 8008)
    server = start_http_server(service, port=port, host="0.0.0.0")
    print(f"serving on :{server.server_address[1]} "
          f"(backend={jax.default_backend()}, batch={batch})", flush=True)
    try:
        import threading

        threading.Event().wait()  # serve until killed
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.close()
        if wav_batcher is not None:
            wav_batcher.close()


def main():
    argparse_n_loop(loop)


if __name__ == "__main__":
    main()
