"""AOT serving export: serialize the serving graph to a portable artifact.

TPU-native deployment story (no reference counterpart — the reference's only
deployment surface is a pickled torch checkpoint that needs the full model
source tree, trainer.py:705-849 + pycasper load).  Here the BN-folded
serving body (serve.py:166-193) is lowered once with ``jax.export`` and the
resulting StableHLO + calling convention is written to disk, so a serving
host can run inference with NO model code — just jax and this loader.

Artifact directory layout::

  manifest.json        format version, shapes, platforms, model metadata
  weights.msgpack      folded serving weights (the exported fn's ARGUMENTS)
  serving_xla.bin      portable variant (cpu+tpu) — XLA folded decoder
  serving_pallas.bin   TPU fast path — Pallas fused decoder (optional)

Weights stay *arguments* of the exported function rather than baked-in
constants (framework convention, see serve.build_serving_fn): the loader
feeds them per call, keeping executable-constant memory flat and device
dispatch cheap.

Compatibility: ``jax.export`` commits to a multi-month forward-compat window
for serialized artifacts; the manifest records
``calling_convention_version`` and the producing jax version so a loader can
refuse artifacts that are too new.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

ARTIFACT_FORMAT = 1
MANIFEST = "manifest.json"
WEIGHTS = "weights.msgpack"

_VARIANTS = {
    # name -> (filename, use_pallas, lowering platforms)
    "xla": ("serving_xla.bin", False, ("cpu", "tpu")),
    "pallas": ("serving_pallas.bin", True, ("tpu",)),
}

# serving consumes the first (audio) modality; widths per steps.py:181
_MODALITY_WIDTHS = {"audio/log_mel_512": 128, "audio/log_mel_400": 64}


def _np_tree(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def export_serving(factory, state, out_dir: str, batch: int = 32,
                   frames: int = 64, variants=("xla", "pallas"),
                   batch_tile: int = 16, mel: Optional[int] = None) -> dict:
    """Export the serving graph for ``factory``/``state`` to ``out_dir``.

    ``variants`` picks which lowered executables to ship (see ``_VARIANTS``);
    both are traced from the same folded weights, so the manifest's single
    ``weights.msgpack`` feeds either.  Returns the manifest dict.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from mixstage_tpu.serve import build_serving_fn

    cfg = factory.cfg
    if mel is None:
        modality = list(cfg.input_modalities)[0]
        if modality not in _MODALITY_WIDTHS:
            raise ValueError(f"pass mel= explicitly for modality "
                             f"{modality!r}")
        mel = _MODALITY_WIDTHS[modality]
    os.makedirs(out_dir, exist_ok=True)

    audio = jax.ShapeDtypeStruct((batch, frames, mel), jnp.float32)
    style_w = jax.ShapeDtypeStruct((batch, cfg.num_speakers), jnp.float32)

    manifest = {
        "format": ARTIFACT_FORMAT,
        "model": cfg.model,
        "batch": batch,
        "frames": frames,
        "mel": mel,
        "num_speakers": int(cfg.num_speakers),
        "num_clusters": int(cfg.num_clusters),
        "out_feats": int(cfg.out_feats),
        "input_modalities": list(cfg.input_modalities),
        "dtype": "float32",
        "jax_version": jax.__version__,
        "variants": {},
    }

    bound = None
    for name in variants:
        fname, use_pallas, platforms = _VARIANTS[name]
        fn = build_serving_fn(factory, state, use_pallas=use_pallas,
                              batch_tile=min(batch_tile, batch))
        if bound is None:
            # identical across variants: same folded weights either way
            bound = _np_tree(fn.bound_args)
        arg_shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), fn.bound_args)
        exp = jexport.export(fn.jitted, platforms=list(platforms))(
            *arg_shapes, audio, style_w)
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        manifest["variants"][name] = {
            "file": fname,
            "platforms": list(platforms),
            "use_pallas": use_pallas,
            "calling_convention_version": exp.calling_convention_version,
        }

    gp, gs, fd, fc = bound
    blob = serialization.msgpack_serialize(
        {"gen_params": gp, "gen_bstats": gs, "fd": fd, "fc": fc})
    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_serving(path: str, prefer: Optional[str] = None):
    """Load an exported artifact; return ``fn(audio, style) -> pose``.

    ``style`` accepts int ids ``(B,)`` (one-hot'ed host-side) or soft
    mixture rows ``(B, num_speakers)`` — same contract as
    ``serve.build_serving_fn``.  Picks the ``pallas`` variant on a TPU
    backend when present, else the portable ``xla`` one; override with
    ``prefer``.  The returned fn carries ``.manifest``, ``.variant``,
    ``.static_batch`` and ``.frames`` for the serving front end.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format", 0) > ARTIFACT_FORMAT:
        raise ValueError(
            f"artifact format {manifest['format']} is newer than this "
            f"loader ({ARTIFACT_FORMAT})")

    backend = jax.default_backend()
    variants = manifest["variants"]
    if prefer is None:
        if backend == "tpu" and "pallas" in variants:
            prefer = "pallas"
        else:
            compat = [n for n, m in variants.items()
                      if backend in m["platforms"]]
            if not compat:
                raise ValueError(
                    f"no variant lowered for backend {backend!r}: artifact "
                    f"has " + ", ".join(f"{n} (lowered for "
                                        f"{m['platforms']})"
                                        for n, m in variants.items()))
            prefer = compat[0]
    if prefer not in variants:
        raise ValueError(f"variant {prefer!r} not in artifact "
                         f"(has {sorted(variants)})")
    meta = variants[prefer]
    if backend not in meta["platforms"]:
        raise ValueError(
            f"variant {prefer!r} was lowered for {meta['platforms']}, "
            f"but the current backend is {backend!r}")

    with open(os.path.join(path, meta["file"]), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(path, WEIGHTS), "rb") as f:
        w = serialization.msgpack_restore(f.read())
    bound = jax.device_put((w["gen_params"], w["gen_bstats"],
                            w["fd"], w["fc"]))
    call = jax.jit(exp.call)

    B, T, mel = manifest["batch"], manifest["frames"], manifest["mel"]
    S = manifest["num_speakers"]

    def fn(audio, style):
        audio = jnp.asarray(audio, jnp.float32)
        if audio.shape != (B, T, mel):
            raise ValueError(
                f"exported graph is static: audio must be {(B, T, mel)}, "
                f"got {tuple(audio.shape)} (pad partial batches upstream — "
                f"serving.DynamicBatcher does)")
        style = jnp.asarray(style)
        sw = (jax.nn.one_hot(style.astype(jnp.int32), S, dtype=audio.dtype)
              if style.ndim == 1 else style.astype(audio.dtype))
        return call(*bound, audio, sw)

    fn.manifest = manifest
    fn.variant = prefer
    fn.static_batch = B
    fn.frames = T
    return fn
