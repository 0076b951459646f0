"""Serving fast path: audio→pose as one jitted graph with the fused decoder.

Production inference path for Mix-StAGE (BASELINE.json north star: serving
latency).  Compared to the training-graph eval:

* BatchNorm is folded into conv weights across the mixture decoder + logits
  (``fold_bn_into_conv``) — inference BN is a pure affine;
* the whole mixture decoder (layer0 + 3 chain layers + grouped 1×1 logits)
  runs as ONE Pallas kernel (``fused_mixstage_decoder``) with activations
  resident in VMEM;
* the backbone (audio encoder, UNet, style embed, cluster classifier) runs as
  the standard flax eval graph.

``build_serving_fn(factory, state)`` returns a jitted fn
``(audio, style_ids) -> pose`` for fixed-size 64-frame clips; pass
``use_pallas=False`` for the XLA-only folded path (CPU / parity testing).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixstage_tpu.ops.mixture import index_select_outputs
from mixstage_tpu.ops.pallas.fused_conv import (fold_bn_into_conv,
                                                fused_mixstage_decoder)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def extract_folded_decoder(gen_params, gen_bstats, num_clusters: int,
                           out_feats: int, eps: float = 1e-5):
    """Fold BN into the decoder chain + logits; return per-group weights.

    Returns dict with:
      w0 (G, 3, C0p, C), wc (L-1, G, 3, C, C), biases (G, L, C),
      w_logits (G, C, F), b_logits (G, F), c0 (unpadded input width).
    """
    G = num_clusters
    layers = sorted([k for k in gen_params if k.startswith("decoder")],
                    key=lambda s: int(s.replace("decoder", "")))
    folded = []
    for name in layers:
        conv = gen_params[name]["conv"]
        norm = gen_params[name]["norm"]
        stats = gen_bstats[name]["norm"]
        k, b = fold_bn_into_conv(conv["kernel"], conv.get("bias"),
                                 norm["scale"], norm["bias"],
                                 stats["mean"], stats["var"], eps)
        folded.append((k, b))  # k: (3, Cin_pg, G*C)

    k0, b0 = folded[0]
    K, C0, GC = k0.shape
    C = GC // G
    C0p = _round_up(C0, 128)
    w0 = jnp.stack([jnp.pad(k0[:, :, g * C:(g + 1) * C],
                            ((0, 0), (0, C0p - C0), (0, 0)))
                    for g in range(G)])                      # (G, 3, C0p, C)
    wc = jnp.stack([
        jnp.stack([k[:, :, g * C:(g + 1) * C] for g in range(G)])
        for k, _ in folded[1:]])                             # (L-1, G, 3, C, C)
    biases = jnp.stack([
        jnp.stack([b[g * C:(g + 1) * C] for k, b in folded])
        for g in range(G)])                                  # (G, L, C)

    lk = gen_params["logits"]["kernel"]                      # (1, C, G*F)
    lb = gen_params["logits"].get("bias")
    F = lk.shape[-1] // G
    w_logits = jnp.stack([lk[0, :, g * F:(g + 1) * F] for g in range(G)])
    b_logits = (jnp.stack([lb[g * F:(g + 1) * F] for g in range(G)])
                if lb is not None else jnp.zeros((G, F), lk.dtype))
    return {"w0": w0, "wc": wc, "biases": biases, "w_logits": w_logits,
            "b_logits": b_logits, "c0": C0, "out_feats": F}


def extract_folded_classify(gen_params, gen_bstats, eps: float = 1e-5):
    """Fold BN through the ClusterClassify chain (6 ConvNormRelu + 1×1 logits
    — layers.py:446-467) into the same layout ``fused_mixstage_decoder``
    consumes with G=1."""
    cc_p = gen_params["classify_cluster"]
    cc_s = gen_bstats["classify_cluster"]
    folded = []
    for i in range(6):
        conv = cc_p["stack"][f"conv{i}"]["conv"]
        norm = cc_p["stack"][f"conv{i}"]["norm"]
        stats = cc_s["stack"][f"conv{i}"]["norm"]
        folded.append(fold_bn_into_conv(conv["kernel"], conv.get("bias"),
                                        norm["scale"], norm["bias"],
                                        stats["mean"], stats["var"], eps))
    k0, b0 = folded[0]
    _, C0, C = k0.shape
    C0p = _round_up(C0, 128)
    w0 = jnp.pad(k0, ((0, 0), (0, C0p - C0), (0, 0)))[None]   # (1,3,C0p,C)
    wc = jnp.stack([k for k, _ in folded[1:]])[:, None]       # (5,1,3,C,C)
    biases = jnp.stack([b for _, b in folded])[None]          # (1,6,C)
    lk = cc_p["logits"]["kernel"]                             # (1, C, M)
    lb = cc_p["logits"].get("bias")
    w_logits = lk                                             # (1, C, M)
    b_logits = (lb[None] if lb is not None
                else jnp.zeros((1, lk.shape[-1]), lk.dtype))
    return {"w0": w0, "wc": wc, "biases": biases, "w_logits": w_logits,
            "b_logits": b_logits, "c0": C0}


def folded_decoder_xla(x, fd, groups: int, negative_slope: float = 0.2):
    """XLA folded decoder (parity / CPU fallback for the Pallas kernel)."""
    G = groups
    C0 = fd["c0"]
    outs = []
    for g in range(G):
        h = x[:, :, :C0]
        w0g = fd["w0"][g][:, :C0, :]
        h = jax.lax.conv_general_dilated(
            h, w0g, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))
        h = h + fd["biases"][g, 0][None, None, :]
        h = jnp.where(h >= 0, h, negative_slope * h)
        for l in range(fd["wc"].shape[0]):
            h = jax.lax.conv_general_dilated(
                h, fd["wc"][l, g], (1,), [(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            h = h + fd["biases"][g, l + 1][None, None, :]
            h = jnp.where(h >= 0, h, negative_slope * h)
        outs.append(h @ fd["w_logits"][g] + fd["b_logits"][g][None, None, :])
    return jnp.concatenate(outs, axis=-1)


def build_serving_fn(factory, state, use_pallas: Optional[bool] = None,
                     batch_tile: int = 16, mesh=None,
                     quantize_int8: bool = False, calib=None,
                     partition: str = "batch"):
    """Jitted ``(audio (B, T, mel), style_ids (B,)) -> pose (B, T, F)``.

    ``quantize_int8=True`` swaps the mixture decoder (the ~52/62 GFLOP hot
    loop of this graph) for its int8 twin (``ops/pallas/quant.py``): int8
    MXU dots at ~2x the bf16 rate, post-training symmetric quantization
    calibrated on ``calib=(audio, style_ids)`` (required).  This is an
    OPT-IN accuracy/speed tier — measured drift is a few percent, outside
    the 1%% contract of the default fused path; bench.py reports it.

    Weights are passed as explicit jit arguments (NOT closures) — closing over
    the ~25 MB of folded weights bakes them in as executable constants, which
    costs ~30 ms of per-call sync latency through the device transport.

    ``mesh``: a ``jax.sharding.Mesh`` for multi-chip serving.  ``partition``
    picks the layout:

    * ``"batch"`` (default, the production tier): weights replicated, the
      batch sharded over the mesh's first axis via ``jax.shard_map`` (each
      chip serves its batch shard; inference is embarrassingly parallel,
      zero collectives in the graph).  shard_map rather than bare GSPMD
      because the Pallas decoder kernel is a custom call XLA's partitioner
      cannot split; under shard_map it runs per-device on the local shard.
      The batch size must divide the mesh axis size.
    * ``"time"`` (sequence parallelism): ONE long clip's time axis sharded
      over the mesh — the layout that cuts latency when the work is a
      single long request (B=1, T up to the 4096-frame serving cap) that
      batch sharding cannot split.  Pure GSPMD: weights replicated, audio
      annotated ``P(None, axis)``, XLA inserts the conv halo exchanges
      (every op in this graph is time-local except the size-3 convs).
      Requires the XLA decoder path (a Pallas custom call cannot be
      partitioned over time).
    * ``"expert"``: the M mixture experts sharded over the mesh axis —
      serving-side expert parallelism, the same decomposition
      ``shard_state_mixture`` uses for training EP.  Each chip runs the
      (replicated) content/style backbone, decodes only its local experts,
      weighs them with its local slice of the mixture attention, and ONE
      psum over the axis realizes ``index_select_outputs``'s sum over
      experts.  Works with the Pallas kernel (it runs per-device on local
      groups under shard_map).  The axis size must divide ``num_clusters``
      (whole experts per device); the int8 tier stays batch-partitioned.
    """
    cfg = factory.cfg
    if partition not in ("batch", "time", "expert"):
        raise ValueError(f"unknown partition {partition!r}; expected "
                         "'batch', 'time' or 'expert'")
    if partition != "batch" and mesh is None:
        raise ValueError(f"partition={partition!r} needs a mesh")
    if partition == "time":
        if use_pallas:
            raise ValueError(
                "time partitioning requires the XLA decoder path: a Pallas "
                "custom call cannot be partitioned over its time axis")
        use_pallas = False
    if partition == "expert" and quantize_int8:
        raise ValueError("the int8 tier is batch-partitioned only (its "
                         "per-channel scale layout is not expert-sliced)")
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    gen_params = jax.device_put(state.g_params["gen"])
    gen_bstats = jax.device_put(state.g_state["gen"])
    fd = extract_folded_decoder(
        state.g_params["gen"], state.g_state["gen"], cfg.num_clusters,
        cfg.out_feats)
    c0 = int(fd.pop("c0"))      # static ints must not become tracers
    fd.pop("out_feats")
    s_in = None
    if quantize_int8:
        from mixstage_tpu.ops.pallas.quant import quantize_folded_decoder

        if calib is None:
            raise ValueError("quantize_int8 needs calib=(audio, style_ids) "
                             "for the one-shot activation calibration pass")
        ca = jnp.asarray(calib[0], jnp.float32)
        cw = jax.nn.one_hot(jnp.asarray(calib[1], jnp.int32),
                            cfg.num_speakers, dtype=ca.dtype) \
            if jnp.asarray(calib[1]).ndim == 1 else \
            jnp.asarray(calib[1], ca.dtype)
        cB, cT = ca.shape[0], ca.shape[1]
        feats = factory.gen.apply(
            {"params": state.g_params["gen"],
             "batch_stats": state.g_state["gen"]},
            [ca], jnp.zeros((cB, cT, cfg.out_feats), ca.dtype),
            cw[:, None, :].repeat(cT, axis=1), method="features",
            input_modalities=list(cfg.input_modalities),
            use_pose_input=False, train=False)
        C0p_ = fd["w0"].shape[2]
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, C0p_ - feats.shape[-1])))
        fd = quantize_folded_decoder(fd, feats)
        s_in = fd.pop("s_in")   # static: the int8 kernel jit requires it
    fd = jax.device_put(fd)
    fc = extract_folded_classify(state.g_params["gen"], state.g_state["gen"])
    fc.pop("c0")
    fc = jax.device_put(fc)
    G = cfg.num_clusters
    C0p = fd["w0_i8" if quantize_int8 else "w0"].shape[2]

    def _features_soft(gen_params, gen_bstats, fc, audio, style_w):
        """Content+style features and the (B, T, G) mixture attention."""
        T = audio.shape[1]
        # style_w: (B, num_speakers) mixture weights — a one-hot row is the
        # hard-id case; soft rows give online style mixtures (the reference's
        # -mix semantics, argsUtils/-mix + EmbLin 'lin' mode)
        sw = style_w[:, None, :].repeat(T, axis=1)
        y_dummy = jnp.zeros(audio.shape[:2] + (cfg.out_feats,), audio.dtype)
        variables = {"params": gen_params, "batch_stats": gen_bstats}
        common = dict(input_modalities=list(cfg.input_modalities),
                      use_pose_input=False, train=False)
        if use_pallas:
            # content+style features from flax; BOTH conv chains (cluster
            # classifier + mixture decoder) run as fused Pallas kernels
            x = factory.gen.apply(variables, [audio], y_dummy, sw,
                                  method="features", **common)
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, C0p - x.shape[-1])))
            scores = fused_mixstage_decoder(
                xp, fc["w0"], fc["wc"], fc["biases"], fc["w_logits"],
                fc["b_logits"], groups=1, batch_tile=batch_tile)
            soft = jax.nn.softmax(scores, axis=-1)
        else:
            x, _, soft = factory.gen.apply(variables, [audio], y_dummy, sw,
                                           method="backbone", **common)
            xp = (jnp.pad(x, ((0, 0), (0, 0), (0, C0p - x.shape[-1])))
                  if quantize_int8 else None)
        return x, xp, soft

    def _decode(x, xp, fd, groups):
        """Grouped decoder logits (B, T, groups*F) for ``groups`` experts —
        the full G, or a local shard under expert partitioning."""
        if use_pallas:
            if quantize_int8:
                from mixstage_tpu.ops.pallas.quant import \
                    fused_mixstage_decoder_int8
                return fused_mixstage_decoder_int8(
                    xp, fd["w0_i8"], fd["wc_i8"], fd["m0"], fd["mc"],
                    fd["rq"], fd["biases"], fd["wl_i8"], fd["ml"],
                    fd["b_logits"], s_in=s_in, groups=groups,
                    batch_tile=batch_tile).astype(x.dtype)
            return fused_mixstage_decoder(
                xp, fd["w0"], fd["wc"], fd["biases"], fd["w_logits"],
                fd["b_logits"], groups=groups, batch_tile=batch_tile)
        if quantize_int8:
            from mixstage_tpu.ops.pallas.quant import decoder_int8_xla
            return decoder_int8_xla(
                xp, {**fd, "s_in": s_in}, groups).astype(x.dtype)
        return folded_decoder_xla(x, {**fd, "c0": c0}, groups)

    def serve_body(gen_params, gen_bstats, fd, fc, audio, style_w):
        x, xp, soft = _features_soft(gen_params, gen_bstats, fc, audio,
                                     style_w)
        logits = _decode(x, xp, fd, G)
        return index_select_outputs(logits, soft, G)

    def _style_weights(style, audio):
        """(B,) int ids → one-hot weights; (B, S) float rows pass through."""
        style = jnp.asarray(style)
        if style.ndim == 1:
            return jax.nn.one_hot(style.astype(jnp.int32), cfg.num_speakers,
                                  dtype=audio.dtype)
        return style.astype(audio.dtype)

    if mesh is None:
        serve = jax.jit(serve_body)

        def fn(audio, style_ids):
            return serve(gen_params, gen_bstats, fd, fc, audio,
                         _style_weights(style_ids, audio))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
        repl = NamedSharding(mesh, P())
        if partition == "batch":
            gen_params, gen_bstats, fd, fc = jax.device_put(
                (gen_params, gen_bstats, fd, fc), repl)
            serve = jax.jit(jax.shard_map(
                serve_body, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(axis), P(axis)),
                out_specs=P(axis)))

            def fn(audio, style_ids):
                assert audio.shape[0] % n == 0, (
                    f"DP serving: batch {audio.shape[0]} must divide the "
                    f"{n}-device '{axis}' mesh axis")
                return serve(gen_params, gen_bstats, fd, fc, audio,
                             _style_weights(style_ids, audio))
        elif partition == "time":
            # GSPMD sequence parallelism: annotate the clip's time axis over
            # the mesh and let XLA insert the size-3-conv halo exchanges —
            # semantics-preserving by construction, so the output matches
            # the single-device graph.
            gen_params, gen_bstats, fd, fc = jax.device_put(
                (gen_params, gen_bstats, fd, fc), repl)
            shard_t = NamedSharding(mesh, P(None, axis))
            serve = jax.jit(
                serve_body,
                in_shardings=(repl, repl, repl, repl, shard_t, repl),
                out_shardings=shard_t)

            def fn(audio, style_ids):
                return serve(gen_params, gen_bstats, fd, fc, audio,
                             _style_weights(style_ids, audio))
        else:  # partition == "expert"
            if G % n:
                raise ValueError(
                    f"expert serving: the {n}-device '{axis}' mesh axis "
                    f"must divide num_clusters {G} (whole experts per "
                    f"device)")

            def serve_body_ep(gen_params, gen_bstats, fd, fc, audio,
                              style_w):
                # shard_map body: fd arrives pre-split on its expert axis.
                # Every device runs the replicated backbone, decodes only
                # its local experts, weighs them with its local slice of
                # the mixture attention, and the psum over the expert axis
                # IS index_select_outputs' sum over experts.
                x, xp, soft = _features_soft(gen_params, gen_bstats, fc,
                                             audio, style_w)
                g_local = fd["w0"].shape[0]
                start = jax.lax.axis_index(axis) * g_local
                soft_local = jax.lax.dynamic_slice_in_dim(
                    soft, start, g_local, axis=-1)
                partial = index_select_outputs(
                    _decode(x, xp, fd, g_local), soft_local, g_local)
                return jax.lax.psum(partial, axis)

            fd_specs = {"w0": P(axis), "wc": P(None, axis),
                        "biases": P(axis), "w_logits": P(axis),
                        "b_logits": P(axis)}
            fd = {k: jax.device_put(v, NamedSharding(mesh, fd_specs[k]))
                  for k, v in fd.items()}
            gen_params, gen_bstats, fc = jax.device_put(
                (gen_params, gen_bstats, fc), repl)
            serve = jax.jit(jax.shard_map(
                serve_body_ep, mesh=mesh,
                in_specs=(P(), P(), fd_specs, P(), P(), P()),
                out_specs=P()))

            def fn(audio, style_ids):
                return serve(gen_params, gen_bstats, fd, fc, audio,
                             _style_weights(style_ids, audio))

    # expose the jitted inner fn + bound weights for cost analysis (bench.py);
    # the inner body takes (B, S) style WEIGHTS — style_weights converts ids
    fn.jitted = serve
    fn.bound_args = (gen_params, gen_bstats, fd, fc)
    fn.style_weights = _style_weights
    return fn


def build_waveform_serving_fn(factory, state, seconds: float = 4.3,
                              sr: int = 16000, mel_fs: int = 103,
                              pose_fs: int = 15,
                              use_pallas: Optional[bool] = None):
    """End-to-end ``(waveform (B, samples), style_ids) -> pose`` serving graph.

    Composes the on-device log-mel frontend (``log_mel_spectrogram_jax``,
    matching the reference's log_mel_400 pipeline — audio.py:123-148) with the
    windowing stride (round(mel_fs / pose_fs), dataUtils.py:510-527) and the
    fused model serving path, so raw 16 kHz audio to pose keypoints is ONE
    jitted XLA graph — the BASELINE.json north star for the serving frontend.

    Use with models trained on audio/log_mel_400 (64 mel bins).
    """
    from mixstage_tpu.data.audio import log_mel_spectrogram_jax

    stride = round(mel_fs / pose_fs)
    mel_window = int(seconds * mel_fs)
    steps = len(range(0, mel_window, stride))
    # samples required for mel_window STFT frames (n_fft 512, hop 160,
    # center=False — audio.py log_mel_400 parameters)
    n_samples = (mel_window - 1) * 160 + 512
    serve = build_serving_fn(factory, state, use_pallas=use_pallas)

    @jax.jit
    def frontend(wav):
        mel = log_mel_spectrogram_jax(wav)          # (B, frames, 64)
        return mel[:, :mel_window:stride, :]         # (B, steps, 64)

    def serve_wav(wav, style_ids):
        assert wav.shape[-1] >= n_samples, \
            f"need at least {n_samples} samples ({seconds}s at {sr} Hz)"
        mel = frontend(wav[..., :n_samples])
        assert mel.shape[1] == steps
        return serve(mel, style_ids)

    return serve_wav
