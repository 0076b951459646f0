"""Reference torch-checkpoint importer (mixstage_tpu/interop/torch_import.py).

Builds live reference modules (like tests/test_torch_parity.py), saves their
state_dict the way pycasper would (``torch.save(model.state_dict(), ...)``,
reference trainer.py:142-148), converts through the string-keyed importer and
pins eval outputs against the torch forward — the same bar the hand-written
parity tests set, but through the production migration path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import (_load_ref, randomize_bn_stats,  # noqa: E402
                               t2j_conv1d)
from mixstage_tpu.interop.torch_import import (  # noqa: E402
    convert_reference_checkpoint, load_torch_state_dict, sniff_torch_file)
from mixstage_tpu.train.steps import StepConfig, StepFactory  # noqa: E402

T, MEL, FEATS, M, S = 64, 128, 96, 4, 3


def _make_batch(B=2, seed=5):
    rng = np.random.default_rng(seed)
    audio = rng.normal(size=(B, T, MEL)).astype(np.float32)
    y = rng.normal(size=(B, T, FEATS)).astype(np.float32)
    return audio, y, {
        "x": (jnp.asarray(audio),), "y": jnp.asarray(y),
        "labels": jnp.zeros((B, T), jnp.int32),
        "style": jnp.zeros((B, T), jnp.int32)}


def _ref_gan(model="JointLateClusterSoftStyle4_G"):
    ref_s2g = _load_ref("speech2gesture")
    ref_gan = _load_ref("gan")
    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    if model == "JointLateClusterSoftStyle4_G":
        ref_jl = _load_ref("joint_late_cluster_soft_style")
        G = ref_jl.JointLateClusterSoftStyle4_G(
            time_steps=T, out_feats=FEATS, num_clusters=M,
            style_dict={f"sp{i}": i for i in range(S)}, shape=shape)
    else:
        G = ref_s2g.Speech2Gesture_G(time_steps=T, out_feats=FEATS)
    D = ref_s2g.Speech2Gesture_D(in_channels=FEATS)
    gan = ref_gan.GAN(G, D, dg_iter_ratio=0.0, criterion="L1Loss",
                      input_modalities=["audio/log_mel_512"],
                      no_grad=False).float().eval()
    randomize_bn_stats(gan, seed=7)
    return gan, G, D


def _template(model):
    cfg = StepConfig(model=model, gan=True, criterion="L1Loss",
                     num_clusters=M, num_speakers=S)
    factory = StepFactory(cfg, donate=False)
    _, _, batch = _make_batch()
    state = factory.init(jax.random.key(0), batch)
    return factory, state


def _save_ref_ckpt(module, path):
    torch.save(module.state_dict(), str(path))


def test_import_mixstage_generator_matches_torch_forward(tmp_path):
    gan, G, D = _ref_gan()
    path = tmp_path / "exp_1_cpk_m_weights.p"
    _save_ref_ckpt(gan, path)

    factory, state = _template("JointLateClusterSoftStyle4_G")
    sd = load_torch_state_dict(str(path))
    template = {"g_params": jax.tree.map(np.asarray, state.g_params),
                "g_state": jax.tree.map(np.asarray, state.g_state),
                "d_params": jax.tree.map(np.asarray, state.d_params),
                "d_state": jax.tree.map(np.asarray, state.d_state)}
    conv, report = convert_reference_checkpoint(sd, template)
    assert not report["surprising_skipped"], report["surprising_skipped"]

    # forward parity on the sampling path (hard style ids)
    audio, y, _ = _make_batch(seed=11)
    style_ids = np.zeros((2, T), np.int32)
    sw = jax.nn.one_hot(jnp.asarray(style_ids), S)
    variables = {"params": conv["g_params"]["gen"],
                 "batch_stats": conv["g_state"]["gen"]}
    out = factory.gen.apply(variables, [jnp.asarray(audio)], jnp.asarray(y),
                            sw, input_modalities=["audio/log_mel_512"],
                            use_pose_input=False, train=False)
    with torch.no_grad():
        labels = torch.zeros(2, T).long()
        ref_pose, _ = G([torch.from_numpy(audio), labels],
                        torch.from_numpy(y),
                        input_modalities=["audio/log_mel_512"],
                        style=torch.from_numpy(style_ids).long(),
                        sample_flag=1, description="test", epoch=0)
    np.testing.assert_allclose(np.asarray(out["pose"]), ref_pose.numpy(),
                               rtol=5e-3, atol=5e-3)

    # discriminator + pose-style-encoder leaves: value-level spot checks
    np.testing.assert_allclose(
        conv["d_params"]["conv1"]["kernel"],
        np.asarray(t2j_conv1d(D.conv1[0].weight)), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        conv["g_params"]["psenc"]["stack"]["conv3"]["conv"]["kernel"],
        np.asarray(t2j_conv1d(G.pose_style_encoder.conv[3].conv.weight)),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        conv["g_state"]["gen"]["unet"]["down2"]["norm"]["mean"],
        G.unet.conv1[2].norm.running_mean.numpy(), rtol=1e-6, atol=1e-6)


def test_import_s2g_generator_matches_torch_forward(tmp_path):
    gan, G, D = _ref_gan("Speech2Gesture_G")
    path = tmp_path / "exp_2_cpk_m_weights.p"
    _save_ref_ckpt(gan, path)

    factory, state = _template("Speech2Gesture_G")
    sd = load_torch_state_dict(str(path))
    template = {"g_params": jax.tree.map(np.asarray, state.g_params),
                "g_state": jax.tree.map(np.asarray, state.g_state),
                "d_params": jax.tree.map(np.asarray, state.d_params),
                "d_state": jax.tree.map(np.asarray, state.d_state)}
    conv, report = convert_reference_checkpoint(sd, template)
    assert not report["surprising_skipped"], report["surprising_skipped"]

    audio, y, _ = _make_batch(seed=12)
    variables = {"params": conv["g_params"]["gen"],
                 "batch_stats": conv["g_state"]["gen"]}
    out, _ = factory.gen.apply(variables, jnp.asarray(audio),
                               jnp.asarray(y), train=False)
    with torch.no_grad():
        ref_pose, _ = G(torch.from_numpy(audio), torch.from_numpy(y),
                        time_steps=T)
    np.testing.assert_allclose(np.asarray(out), ref_pose.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_square_linear_weight_is_transposed():
    """Self-review r4: the linear transpose is decided by the flax leaf
    role ('kernel'), not by shape — a square Cin==Cout torch Linear weight
    must still import as W.T, which a shape heuristic silently skips."""
    from mixstage_tpu.interop.torch_import import _to_flax

    w = np.arange(16, dtype=np.float32).reshape(4, 4)  # torch (Cout, Cin)
    out = _to_flax(w, np.zeros((4, 4), np.float32), "net.lin.weight",
                   flax_path="lin/kernel")
    np.testing.assert_array_equal(out, w.T)
    # embedding-style 2-D leaves (not 'kernel') stay untransposed
    out2 = _to_flax(w, np.zeros((4, 4), np.float32), "net.emb.weight",
                    flax_path="emb/embedding")
    np.testing.assert_array_equal(out2, w)


def test_import_missing_key_raises(tmp_path):
    gan, G, D = _ref_gan()
    sd = {k: v.detach().numpy() for k, v in gan.state_dict().items()}
    del sd["G.decoder.2.conv.weight"]
    _, state = _template("JointLateClusterSoftStyle4_G")
    template = {"g_params": jax.tree.map(np.asarray, state.g_params),
                "g_state": jax.tree.map(np.asarray, state.g_state),
                "d_params": jax.tree.map(np.asarray, state.d_params),
                "d_state": jax.tree.map(np.asarray, state.d_state)}
    with pytest.raises(ValueError, match="decoder"):
        convert_reference_checkpoint(sd, template)


def test_sniff_detects_formats(tmp_path):
    gan, _, _ = _ref_gan("Speech2Gesture_G")
    tpath = tmp_path / "t_weights.p"
    _save_ref_ckpt(gan, tpath)
    assert sniff_torch_file(str(tpath))
    # legacy (non-zip) torch serialization
    lpath = tmp_path / "legacy_weights.p"
    torch.save(gan.state_dict(), str(lpath), _use_new_zipfile_serialization=False)
    assert sniff_torch_file(str(lpath))
    from flax import serialization
    mpath = tmp_path / "m_weights.p"
    with open(mpath, "wb") as f:
        f.write(serialization.msgpack_serialize({"a": np.zeros(3)}))
    assert not sniff_torch_file(str(mpath))
    assert not sniff_torch_file(str(tmp_path))  # directory


@pytest.mark.slow
def test_import_cli_e2e_over_synthetic_pats(tmp_path_factory):
    """Full migration path: a 'reference experiment' (torch state_dict +
    pycasper args file) on the synthetic fixture → cli.import_torch →
    a standalone native experiment that restores into a Trainer."""
    from mixstage_tpu.cli import import_torch as cli_import
    from mixstage_tpu.config import config_from_dict
    from mixstage_tpu.data.synthetic import make_synthetic_dataset
    from mixstage_tpu.train.trainer import Trainer

    synth = str(tmp_path_factory.mktemp("pats_imp"))
    make_synthetic_dataset(synth, speakers=["oliver", "maher"],
                           num_intervals_per_speaker=3)
    ref_dir = str(tmp_path_factory.mktemp("ref_exp"))
    out_dir = str(tmp_path_factory.mktemp("imported"))

    cfg_d = dict(path2data=synth, speaker=["oliver", "maher"],
                 modalities=["pose/data", "audio/log_mel_512"],
                 fs_new=[15, 15], batch_size=4, num_epochs=1, window_hop=5,
                 save_dir=ref_dir, exp=1, num_iters=2, debug=2, render=0,
                 model="JointLateClusterSoftStyle4_G", gan=1,
                 loss="L1Loss", num_clusters=2, style_iters=4)
    probe = Trainer(config_from_dict(dict(cfg_d)),
                    ["exp", "cpk", "speaker", "model", "note"], {})
    out_feats = probe.data_shape[probe.output_modality][-1] \
        - 2 * len(probe.mask)
    T = probe.data_shape[probe.input_modalities[0]][0]
    style_dict = probe.style_dict

    # fabricate the reference experiment: torch weights + pycasper args
    ref_jl = _load_ref("joint_late_cluster_soft_style")
    ref_s2g = _load_ref("speech2gesture")
    ref_gan_mod = _load_ref("gan")
    shape = {m: list(probe.data_shape[m]) for m in probe.data_shape}
    G = ref_jl.JointLateClusterSoftStyle4_G(
        time_steps=T, out_feats=out_feats, num_clusters=2,
        style_dict=style_dict, shape=shape)
    D = ref_s2g.Speech2Gesture_D(in_channels=out_feats)
    tgan = ref_gan_mod.GAN(G, D, dg_iter_ratio=0.0, criterion="L1Loss",
                           input_modalities=["audio/log_mel_512"],
                           no_grad=False).float()
    randomize_bn_stats(tgan, seed=3)
    prefix = probe.book.name.prefix
    torch.save(tgan.state_dict(), os.path.join(ref_dir,
                                               f"{prefix}_weights.p"))
    # the probe already wrote {prefix}_args.args in ref_dir (same contract
    # as a reference experiment's pycasper args file)

    args = config_from_dict(dict(cfg_d))
    args.load = os.path.join(ref_dir, f"{prefix}_weights.p")
    args.out_dir = out_dir
    cli_import.loop(args, 1)

    files = os.listdir(out_dir)
    assert any(f.endswith("_weights.p") for f in files), files
    assert any(f.endswith("_args.args") for f in files), files
    wpath = os.path.join(out_dir, [f for f in files
                                   if f.endswith("_weights.p")][0])
    # and the imported experiment restores natively with matching weights
    cfg2 = config_from_dict(dict(cfg_d, save_dir=out_dir, load=wpath))
    tr2 = Trainer(cfg2, ["exp", "cpk", "speaker", "model", "note"], {})
    np.testing.assert_allclose(
        np.asarray(tr2.state.g_params["gen"]["logits"]["kernel"]),
        np.asarray(t2j_conv1d(G.logits.weight)), rtol=1e-6, atol=1e-6)


def test_bookkeeper_load_converts_torch_checkpoint(tmp_path):
    """BookKeeper._load_model auto-detects + converts a torch checkpoint, so
    every CLI's -load accepts reference experiments directly."""
    from mixstage_tpu.bookkeeping import BookKeeper
    from mixstage_tpu.config import Config

    gan, G, _ = _ref_gan("Speech2Gesture_G")
    path = tmp_path / "exp_9_cpk_m_weights.p"
    _save_ref_ckpt(gan, path)

    factory, state = _template("Speech2Gesture_G")
    args = Config()
    args.save_dir = (tmp_path / "out").as_posix()
    args.load = str(path)
    args.exp = 9
    book = BookKeeper(args, ["exp", "cpk"])
    loaded = book._load_model(state)
    np.testing.assert_allclose(
        np.asarray(loaded.g_params["gen"]["logits"]["kernel"]),
        np.asarray(t2j_conv1d(G.logits.weight)), rtol=1e-6, atol=1e-6)

    # export writes a standalone native experiment the loader round-trips
    out_dir = (tmp_path / "imported").as_posix()
    wpath = book.export_experiment(loaded, out_dir)
    args2 = Config()
    args2.save_dir = out_dir
    args2.load = wpath
    args2.exp = 9
    book2 = BookKeeper(args2, ["exp", "cpk"])
    again = book2._load_model(state)
    np.testing.assert_allclose(
        np.asarray(again.g_params["gen"]["logits"]["kernel"]),
        np.asarray(loaded.g_params["gen"]["logits"]["kernel"]))
    assert book2.args.load == wpath  # restored args dropped the torch path
