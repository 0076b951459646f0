"""Model-family shape/behaviour tests (test strategy per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixstage_tpu.models import (JointLateClusterSoftStyle4_G,
                                 Speech2Gesture_D, Speech2Gesture_G,
                                 StyleClassifier_G)
from mixstage_tpu.models.layers import (EmbLin, PoseStyleEncoder, UNet1D,
                                        curriculum_value)
from mixstage_tpu.ops.mixture import index_select_outputs

B, T, MEL, FEATS = 2, 64, 128, 96


def init_and_apply(model, *args, train=False, **kwargs):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, *args, train=train, **kwargs)
    out = model.apply(variables, *args, train=train, **kwargs,
                      rngs={"dropout": jax.random.key(2)})
    return variables, out


def test_speech2gesture_g_shapes():
    x = jnp.ones((B, 64, MEL))  # raw audio window before subsample-to-64
    model = Speech2Gesture_G(time_steps=T, out_feats=FEATS)
    _, (pose, internal) = init_and_apply(model, x)
    assert pose.shape == (B, T, FEATS)
    assert internal == []
    assert np.isfinite(np.asarray(pose)).all()


def test_speech2gesture_d_shapes():
    x = jnp.ones((B, T, FEATS))
    model = Speech2Gesture_D(in_channels=FEATS)
    _, (score, internal) = init_and_apply(model, x)
    # 64 → 32 → 16 → conv3(k4,s1,p1): 15 → logits(k4,valid): 12
    assert score.shape == (B, 12)
    assert np.isfinite(np.asarray(score)).all()


def test_unet_requires_divisible_length():
    model = UNet1D(16, 16)
    with pytest.raises(AssertionError):
        model.init(jax.random.key(0), jnp.ones((1, 60, 16)), train=False)


def test_mixture_select_matches_manual():
    rng = np.random.default_rng(0)
    M, F = 4, 8
    x = rng.normal(size=(B, T, M * F))
    labels = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, T, M))), -1)
    out = index_select_outputs(jnp.asarray(x), labels, M)
    manual = (x.reshape(B, T, M, F) * np.asarray(labels)[..., None]).sum(-2)
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-4, atol=1e-6)


def test_emblin_lin_equals_emb_for_onehot():
    model = EmbLin(num_embeddings=5, embedding_dim=7)
    v = model.init(jax.random.key(0), jnp.zeros((B, 5)), mode="lin")
    idx = jnp.array([1, 3])
    hard = model.apply(v, idx, mode="emb")
    soft = model.apply(v, jax.nn.one_hot(idx, 5), mode="lin")
    np.testing.assert_allclose(np.asarray(hard), np.asarray(soft), rtol=1e-6)


@pytest.mark.parametrize("use_pose_input", [False, True])
def test_mix_stage_generator(use_pose_input):
    S, M = 3, 8
    audio = jnp.ones((B, 64, MEL))
    y = jnp.ones((B, T, FEATS))
    style_w = jax.nn.one_hot(jnp.zeros((B, T), jnp.int32), S)
    model = JointLateClusterSoftStyle4_G(time_steps=T, out_feats=FEATS,
                                         num_clusters=M, num_speakers=S)
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, [audio], y, style_w,
                           input_modalities=["audio/log_mel_512"],
                           use_pose_input=use_pose_input, train=False)
    out = model.apply(variables, [audio], y, style_w,
                      input_modalities=["audio/log_mel_512"],
                      use_pose_input=use_pose_input, train=False)
    assert out["pose"].shape == (B, T, FEATS)
    assert out["labels_score"].shape == (B, T, M)
    np.testing.assert_allclose(np.asarray(out["labels_cap_soft"].sum(-1)),
                               np.ones((B, T)), rtol=1e-5)
    # both curriculum variants must build/use the same parameter tree
    assert "pose_encoder" in variables["params"]
    assert "audio_encoder" in variables["params"]


def test_mix_stage_batch_stats_update_in_train_mode():
    S, M = 2, 4
    audio = jnp.ones((B, 64, MEL))
    y = jnp.ones((B, T, FEATS))
    style_w = jax.nn.one_hot(jnp.zeros((B, T), jnp.int32), S)
    model = JointLateClusterSoftStyle4_G(time_steps=T, out_feats=FEATS,
                                         num_clusters=M, num_speakers=S)
    variables = model.init({"params": jax.random.key(0)}, [audio], y, style_w,
                           input_modalities=["audio/log_mel_512"],
                           use_pose_input=False, train=False)
    _, mutated = model.apply(variables, [audio], y, style_w,
                             input_modalities=["audio/log_mel_512"],
                             use_pose_input=False, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
    assert "batch_stats" in mutated
    # pose_encoder was not executed → its stats must be untouched
    old = variables["batch_stats"]["pose_encoder"]
    new = mutated["batch_stats"]["pose_encoder"]
    chex_equal = jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), old, new))
    assert chex_equal


def test_pose_style_encoder_and_classifier():
    y = jnp.ones((B, T, FEATS))
    enc = PoseStyleEncoder(input_channels=FEATS, num_speakers=4)
    _, score = init_and_apply(enc, y)
    assert score.shape == (B, 4)

    clf = StyleClassifier_G(in_channels=FEATS, num_speakers=4)
    _, (logits, internal) = init_and_apply(clf, y)
    assert logits.shape == (B, 4)


def test_curriculum_schedule():
    assert float(curriculum_value(0, 0, 1, 1000)) == 0.0
    assert float(curriculum_value(500, 0, 1, 1000)) == pytest.approx(0.5)
    assert float(curriculum_value(2000, 0, 1, 1000)) == 1.0


def test_pose_and_style_decoders():
    from mixstage_tpu.models.layers import PoseDecoder, StyleDecoder

    M, C, S = 4, 32, 10
    x = jnp.ones((B, T, M * (C + S)))
    dec = PoseDecoder(input_channels=C, style_dim=S, num_clusters=M,
                      out_feats=24)
    v = dec.init({"params": jax.random.key(0)}, x, train=False)
    out = dec.apply(v, x, train=False)
    assert out.shape == (B, T, M * 24)

    sdec = StyleDecoder(input_channels=C + S, num_clusters=M, out_feats=24)
    v2 = sdec.init({"params": jax.random.key(0)}, x, train=False)
    out2 = sdec.apply(v2, x, train=False)
    assert out2.shape == (B, T, M * 24)


def test_einsum_lowerings_match_conv_forms():
    """GroupedPointwiseConv and ConvNormRelu(lowering='einsum') are
    parameter- and math-identical to their nn.Conv grouped forms (the
    dot_general lowerings exist to sidestep XLA SPMD grouped-conv
    partitioner pathologies; see layers.py docstrings)."""
    import numpy as np
    from flax import linen as nn

    from mixstage_tpu.models.layers import (ConvNormRelu,
                                            GroupedPointwiseConv)

    G, C, F = 4, 32, 24
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, G * C)), jnp.float32)

    gpc = GroupedPointwiseConv(features=G * F, groups=G)
    v = gpc.init(jax.random.key(0), x)
    ref = nn.Conv(G * F, kernel_size=(1,), feature_group_count=G)
    out_conv = ref.apply({"params": dict(v["params"])}, x)
    np.testing.assert_array_equal(np.asarray(gpc.apply(v, x)),
                                  np.asarray(out_conv))

    cnr_conv = ConvNormRelu(C, C, type="1d", leaky=True, groups=G)
    cnr_eins = ConvNormRelu(C, C, type="1d", leaky=True, groups=G,
                            lowering="einsum")
    v2 = cnr_conv.init(jax.random.key(1), x, train=False)
    a = np.asarray(cnr_conv.apply(v2, x, train=False), np.float64)
    b = np.asarray(cnr_eins.apply(v2, x, train=False), np.float64)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_2d_relowerings_match_native_conv():
    """_Conv2DS2DFold and _Conv2DIm2col are parameter-compatible, exact-math
    relowerings of the native 2-D convs (TPU lane-padding fixes for the audio
    pyramid; see layers.py docstrings).  Checked fwd AND grad vs nn.Conv with
    identical params."""
    import numpy as np
    from flax import linen as nn

    from mixstage_tpu.models.layers import _Conv2DIm2col, _Conv2DS2DFold

    rng = np.random.default_rng(0)

    # --- s2d fold vs k4 s2 pad1 conv ---
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 64)), jnp.float32)
    fold = _Conv2DS2DFold(features=48)
    v = fold.init(jax.random.key(0), x)
    ref = nn.Conv(48, kernel_size=(4, 4), strides=(2, 2),
                  padding=[(1, 1), (1, 1)])

    def f_fold(p, x):
        return jnp.sum(fold.apply({"params": p}, x) ** 2)

    def f_ref(p, x):
        return jnp.sum(ref.apply({"params": p}, x) ** 2)

    p = v["params"]
    np.testing.assert_allclose(
        np.asarray(fold.apply(v, x)),
        np.asarray(ref.apply({"params": p}, x)), rtol=2e-5, atol=2e-5)
    ga = jax.grad(f_fold)(p, x)
    gb = jax.grad(f_ref)(p, x)
    for ka in ga:
        np.testing.assert_allclose(np.asarray(ga[ka]), np.asarray(gb[ka]),
                                   rtol=3e-4, atol=3e-3)

    # --- im2col vs k3 s1 pad1 conv (grouped too) ---
    for G in (1, 4):
        xg = jnp.asarray(rng.normal(size=(2, 8, 16, 32)), jnp.float32)
        im = _Conv2DIm2col(features=24 * G if G > 1 else 24,
                           kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                           groups=G)
        vi = im.init(jax.random.key(1), xg)
        refi = nn.Conv(im.features, kernel_size=(3, 3),
                       padding=[(1, 1), (1, 1)], feature_group_count=G)
        np.testing.assert_allclose(
            np.asarray(im.apply(vi, xg)),
            np.asarray(refi.apply({"params": vi["params"]}, xg)),
            rtol=2e-5, atol=2e-5)

    # --- non-square kernel (conv7 is k=(3,8) pad=(1,3) shaped) ---
    x7 = jnp.asarray(rng.normal(size=(2, 8, 15, 16)), jnp.float32)
    im7 = _Conv2DIm2col(features=24, kernel_size=(3, 8),
                        padding=((1, 1), (3, 3)))
    v7 = im7.init(jax.random.key(2), x7)
    ref7 = nn.Conv(24, kernel_size=(3, 8), padding=[(1, 1), (3, 3)])
    np.testing.assert_allclose(
        np.asarray(im7.apply(v7, x7)),
        np.asarray(ref7.apply({"params": v7["params"]}, x7)),
        rtol=2e-5, atol=2e-5)


def test_audio_encoder_lowering_plans_match_base():
    """AudioEncoder with any lowering plan is math-identical to the native
    plan (same params, fwd + grad) — the plans only change HOW XLA sees the
    convs, never WHAT is computed.  Also: plans fall back to native convs on
    odd/bucketed shapes (the sampling path)."""
    import numpy as np

    from mixstage_tpu.models.layers import AudioEncoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 128)), jnp.float32)

    base = AudioEncoder(output_feats=16)
    v = base.init(jax.random.key(0), x, train=False)
    out0 = np.asarray(base.apply(v, x, train=False), np.float64)

    def loss(enc, p):
        y, _ = enc.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                         train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g0 = jax.grad(lambda p: loss(base, p))(v["params"])

    plans = [
        ("conv", "s2d", "conv", "s2d", "conv", "s2d", "conv", "conv"),
        ("im2col", "s2d", "im2col", "s2d", "im2col", "s2d", "im2col", "im2col"),
    ]
    for plan in plans:
        enc = AudioEncoder(output_feats=16, lowerings=plan)
        out = np.asarray(enc.apply(v, x, train=False), np.float64)
        np.testing.assert_allclose(out, out0, rtol=1e-4, atol=1e-4)
        g = jax.grad(lambda p: loss(enc, p))(v["params"])
        for path, a in jax.tree.leaves_with_path(g0):
            b_ = jax.tree.leaves_with_path(g)
            np.testing.assert_allclose(
                np.asarray(dict(b_)[path]), np.asarray(a),
                rtol=3e-3, atol=3e-3,
                err_msg=f"grad mismatch at {path} for plan {plan}")

    # odd interval length (sampling path) must still run: falls back to conv
    x_odd = jnp.asarray(rng.normal(size=(2, 27, 128)), jnp.float32)
    enc = AudioEncoder(output_feats=16, lowerings=plans[1])
    v_odd = enc.init(jax.random.key(1), x_odd, train=False)
    y = enc.apply(v_odd, x_odd, train=False)
    assert y.shape == (2, 27, 256)  # time_steps=None resizes to input T
