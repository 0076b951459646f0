"""AOT serving-artifact tests (mixstage_tpu/export.py).

The exported StableHLO graph must reproduce the live serving path exactly
(same lowering, same folded weights), refuse mismatched shapes/backends, and
serve through the production DynamicBatcher with no model code imported on
the "serving host" side.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixstage_tpu.export import (ARTIFACT_FORMAT, MANIFEST, export_serving,
                                 load_serving)

B, T = 2, 64


# tiny_exp (small model + exported artifact) lives in conftest.py — shared
# with tests/test_streaming.py


def test_export_roundtrip_exact(tiny_exp, rng):
    """Loaded artifact == live build_serving_fn, bitwise (same lowering)."""
    from mixstage_tpu.serve import build_serving_fn

    factory, state, art, manifest = tiny_exp
    assert manifest["format"] == ARTIFACT_FORMAT
    assert manifest["variants"]["xla"]["platforms"] == ["cpu", "tpu"]
    assert os.path.getsize(os.path.join(art, "weights.msgpack")) > 0

    fn = load_serving(art)
    assert fn.variant == "xla" and fn.static_batch == B and fn.frames == T

    audio = jnp.asarray(rng.normal(size=(B, T, 128)), jnp.float32)
    styles = np.array([0, 1], np.int32)
    ref = build_serving_fn(factory, state, use_pallas=False)(audio, styles)
    got = fn(audio, styles)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # soft mixture rows pass through; one-hot rows equal hard ids exactly
    onehot = np.eye(2, dtype=np.float32)[styles]
    np.testing.assert_array_equal(np.asarray(fn(audio, onehot)),
                                  np.asarray(ref))
    mix = fn(audio, np.full((B, 2), 0.5, np.float32))
    assert np.isfinite(np.asarray(mix)).all()
    assert not np.array_equal(np.asarray(mix), np.asarray(ref))


def test_export_static_shape_and_format_guards(tiny_exp):
    _, _, art, _ = tiny_exp
    fn = load_serving(art)
    with pytest.raises(ValueError, match="static"):
        fn(np.zeros((B, T + 1, 128), np.float32), np.zeros((B,), np.int32))
    with pytest.raises(ValueError, match="not in artifact"):
        load_serving(art, prefer="pallas")

    # a future-format artifact must be refused, not misread
    man = json.load(open(os.path.join(art, MANIFEST)))
    man["format"] = ARTIFACT_FORMAT + 1
    newer = os.path.join(art, "newer")
    os.makedirs(newer, exist_ok=True)
    json.dump(man, open(os.path.join(newer, MANIFEST), "w"))
    with pytest.raises(ValueError, match="newer"):
        load_serving(newer)


def test_export_pallas_variant_is_tpu_only(tiny_exp, tmp_path):
    """The Pallas fast path lowers for TPU from this CPU host; loading it on
    a cpu backend is refused with a clear error."""
    factory, state, _, _ = tiny_exp
    art = tmp_path.as_posix()
    manifest = export_serving(factory, state, art, batch=B, frames=T,
                              variants=("pallas",))
    assert manifest["variants"]["pallas"]["platforms"] == ["tpu"]
    assert os.path.getsize(os.path.join(art, "serving_pallas.bin")) > 0
    with pytest.raises(ValueError, match="lowered for"):
        load_serving(art)  # default backend here is cpu


def test_batcher_over_artifact(tiny_exp, rng):
    """Production micro-batcher over the loaded artifact: padded partial
    batches answer identically to a direct full-batch call."""
    from mixstage_tpu.serving import DynamicBatcher

    _, _, art, _ = tiny_exp
    fn = load_serving(art)
    audio = np.asarray(rng.normal(size=(B, T, 128)), np.float32)
    styles = np.array([0, 1], np.int32)
    ref = np.asarray(fn(jnp.asarray(audio), styles))

    batcher = DynamicBatcher(lambda a, s: fn(jnp.asarray(a), np.asarray(s)),
                             batch_size=B, max_wait_ms=50.0)
    try:
        fut = batcher.submit(audio[0], 0)  # 1 request → padded batch of 2
        np.testing.assert_allclose(fut.result(120), ref[0],
                                   rtol=1e-6, atol=1e-6)
    finally:
        batcher.close()


@pytest.mark.slow
def test_export_cli_e2e_over_synthetic_pats(tmp_path_factory):
    """Full lifecycle: train on the synthetic fixture → cli.export →
    load_serving on the artifact → pose inference with no Trainer around."""
    from mixstage_tpu.cli import export as cli_export
    from mixstage_tpu.config import config_from_dict
    from mixstage_tpu.data.synthetic import make_synthetic_dataset
    from mixstage_tpu.train.trainer import Trainer

    path = str(tmp_path_factory.mktemp("pats_export"))
    make_synthetic_dataset(path, speakers=["oliver", "maher"],
                           num_intervals_per_speaker=3)
    save_dir = str(tmp_path_factory.mktemp("save_export"))
    base = dict(path2data=path, speaker=["oliver", "maher"],
                modalities=["pose/data", "audio/log_mel_512"],
                fs_new=[15, 15], batch_size=4, num_epochs=1, window_hop=5,
                save_dir=save_dir, exp=1, num_iters=2, debug=2, metrics=0,
                stop_thresh=10, render=0,
                model="JointLateClusterSoftStyle4_G", gan=1,
                loss="L1Loss", num_clusters=4, style_iters=4)
    trainer = Trainer(config_from_dict(base),
                      ["exp", "cpk", "speaker", "model", "note"], {})
    trainer.start_exp()
    trainer.train(exp_num=1)
    trainer.finish_exp()

    art = str(tmp_path_factory.mktemp("artifact_cli"))
    args = config_from_dict(dict(
        base, load=trainer.book.name("weights", "p", save_dir),
        export_dir=art, export_variants="xla,pallas"))
    cli_export.loop(args, 1)

    assert sorted(json.load(open(os.path.join(art, MANIFEST)))["variants"]) \
        == ["pallas", "xla"]
    fn = load_serving(art)
    out = fn(np.random.default_rng(3).normal(size=(4, 64, 128))
             .astype(np.float32), np.array([0, 1, 0, 1], np.int32))
    assert out.shape == (4, 64, 96)
    assert np.isfinite(np.asarray(out)).all()
