"""Golden parity tests: flax layers vs the PyTorch reference with identical
weights.

Loads the reference model files directly from /root/reference (read-only, with
a minimal pycasper stub), copies torch weights into the flax parameter trees,
and compares eval-mode outputs.  This pins the rebuild's layer math to the
reference implementation far more tightly than shape tests.
"""

import contextlib
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---------------------------------------------------------------------------
# reference loading (pycasper stub + direct file import, no package __init__)
# ---------------------------------------------------------------------------


def _install_pycasper_stub():
    if "pycasper" in sys.modules:
        return
    pycasper = types.ModuleType("pycasper")
    tu = types.ModuleType("pycasper.torchUtils")

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
        def __init__(self, lambdas, **kw):
            self.lambdas = list(lambdas)

        def step(self):
            return self.lambdas

    tu.some_grad = some_grad
    tu.LambdaScheduler = LambdaScheduler
    pycasper.torchUtils = tu
    sys.modules["pycasper"] = pycasper
    sys.modules["pycasper.torchUtils"] = tu


def _load_ref(name):
    _install_pycasper_stub()
    full = f"refmodel.{name}"
    if full in sys.modules:
        return sys.modules[full]
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = ["/root/reference/src/model"]
        sys.modules["refmodel"] = pkg
    spec = importlib.util.spec_from_file_location(
        full, f"/root/reference/src/model/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# weight transfer helpers
# ---------------------------------------------------------------------------


def t2j_conv1d(w):
    # .copy(): torch .numpy() is a VIEW and jnp.asarray may alias it zero-copy
    # on CPU — without the copy, later in-place torch updates (optimizer/BN)
    # would silently mutate the "transferred" jax weights
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0).copy())


def t2j_conv2d(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0).copy())


def copy_cnr(tmod, params, stats):
    """torch ConvNormRelu → flax ConvNormRelu variables (in place)."""
    w = tmod.conv.weight
    params["conv"]["kernel"] = (t2j_conv1d(w) if w.dim() == 3
                                else t2j_conv2d(w))
    params["conv"]["bias"] = jnp.asarray(tmod.conv.bias.detach().numpy().copy())
    params["norm"]["scale"] = jnp.asarray(tmod.norm.weight.detach().numpy().copy())
    params["norm"]["bias"] = jnp.asarray(tmod.norm.bias.detach().numpy().copy())
    stats["norm"]["mean"] = jnp.asarray(tmod.norm.running_mean.numpy().copy())
    stats["norm"]["var"] = jnp.asarray(tmod.norm.running_var.numpy().copy())


def randomize_bn_stats(tmod, seed=0):
    """Give BN layers non-trivial running stats so folding/eval is tested."""
    g = torch.Generator().manual_seed(seed)
    for m in tmod.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


def _mutable_variables(variables):
    import copy as _copy

    return _copy.deepcopy(jax.tree.map(np.asarray, variables,
                                       is_leaf=lambda x: hasattr(x, "shape")))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_conv_norm_relu_parity():
    ref_layers = _load_ref("layers")
    from mixstage_tpu.models.layers import ConvNormRelu

    tmod = ref_layers.ConvNormRelu(16, 32, type="1d", leaky=True,
                                   downsample=False).float().eval()
    randomize_bn_stats(tmod)
    model = ConvNormRelu(16, 32, type="1d", leaky=True, downsample=False)
    x = np.random.default_rng(0).normal(size=(2, 64, 16)).astype(np.float32)
    variables = _mutable_variables(
        model.init(jax.random.key(0), jnp.asarray(x), train=False))
    copy_cnr(tmod, variables["params"], variables["batch_stats"])
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)


def test_unet_parity():
    ref_layers = _load_ref("layers")
    from mixstage_tpu.models.layers import UNet1D

    tmod = ref_layers.UNet1D(32, 32).float().eval()
    randomize_bn_stats(tmod)
    model = UNet1D(32, 32)
    x = np.random.default_rng(1).normal(size=(2, 64, 32)).astype(np.float32)
    variables = _mutable_variables(
        model.init(jax.random.key(0), jnp.asarray(x), train=False))
    p, s = variables["params"], variables["batch_stats"]
    copy_cnr(tmod.pre_downsampling_conv[0], p["pre0"], s["pre0"])
    copy_cnr(tmod.pre_downsampling_conv[1], p["pre1"], s["pre1"])
    for i in range(5):
        copy_cnr(tmod.conv1[i], p[f"down{i}"], s[f"down{i}"])
        copy_cnr(tmod.conv2[i], p[f"up{i}"], s[f"up{i}"])
    out = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 1),
                               rtol=2e-3, atol=2e-3)


def test_audio_encoder_parity():
    ref_layers = _load_ref("layers")
    from mixstage_tpu.models.layers import AudioEncoder

    tmod = ref_layers.AudioEncoder(output_feats=64).float().eval()
    randomize_bn_stats(tmod)
    model = AudioEncoder(output_feats=64)
    x = np.random.default_rng(2).normal(size=(2, 64, 128)).astype(np.float32)
    variables = _mutable_variables(
        model.init(jax.random.key(0), jnp.asarray(x), time_steps=64,
                   train=False))
    p, s = variables["params"], variables["batch_stats"]
    for i in range(8):
        copy_cnr(tmod.conv[i], p[f"conv{i}"], s[f"conv{i}"])
    out = model.apply(variables, jnp.asarray(x), time_steps=64, train=False)
    with torch.no_grad():
        # reference input is (N, 1, T, mel) (layers.py:159-199)
        ref = tmod(torch.from_numpy(x[:, None, :, :]), time_steps=64)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 1),
                               rtol=2e-3, atol=2e-3)


def test_discriminator_parity():
    ref_s2g = _load_ref("speech2gesture")
    from mixstage_tpu.models.speech2gesture import Speech2Gesture_D

    tmod = ref_s2g.Speech2Gesture_D(in_channels=96).float().eval()
    randomize_bn_stats(tmod)
    model = Speech2Gesture_D(in_channels=96)
    x = np.random.default_rng(3).normal(size=(2, 64, 96)).astype(np.float32)
    variables = _mutable_variables(
        model.init(jax.random.key(0), jnp.asarray(x), train=False))
    p, s = variables["params"], variables["batch_stats"]
    p["conv1"]["kernel"] = t2j_conv1d(tmod.conv1[0].weight)
    p["conv1"]["bias"] = jnp.asarray(tmod.conv1[0].bias.detach().numpy().copy())
    copy_cnr(tmod.conv2[0], p["conv2_0"], s["conv2_0"])
    copy_cnr(tmod.conv3, p["conv3"], s["conv3"])
    p["logits"]["kernel"] = t2j_conv1d(tmod.logits.weight)
    p["logits"]["bias"] = jnp.asarray(tmod.logits.bias.detach().numpy().copy())
    score, _ = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref, _ = tmod(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(score), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_full_generator_parity():
    """Full Mix-StAGE generator, sampling path (hard style ids)."""
    ref_jl = _load_ref("joint_late_cluster_soft_style")
    from mixstage_tpu.models.mix_stage import JointLateClusterSoftStyle4_G

    T, MEL, FEATS, M, S = 64, 128, 96, 4, 3
    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    style_dict = {f"sp{i}": i for i in range(S)}
    tmod = ref_jl.JointLateClusterSoftStyle4_G(
        time_steps=T, out_feats=FEATS, num_clusters=M,
        style_dict=style_dict, shape=shape).float().eval()
    randomize_bn_stats(tmod)

    model = JointLateClusterSoftStyle4_G(time_steps=T, out_feats=FEATS,
                                         num_clusters=M, num_speakers=S)
    rng = np.random.default_rng(4)
    audio = rng.normal(size=(2, T, MEL)).astype(np.float32)
    y = rng.normal(size=(2, T, FEATS)).astype(np.float32)
    style_ids = np.zeros((2, T), np.int32)
    sw = jax.nn.one_hot(jnp.asarray(style_ids), S)

    variables = _mutable_variables(model.init(
        {"params": jax.random.key(0)}, [jnp.asarray(audio)], jnp.asarray(y),
        sw, input_modalities=["audio/log_mel_512"], use_pose_input=False,
        train=False))
    p, s = variables["params"], variables["batch_stats"]
    for i in range(8):
        copy_cnr(tmod.audio_encoder.conv[i],
                 p["audio_encoder"][f"conv{i}"],
                 s["audio_encoder"][f"conv{i}"])
    copy_cnr(tmod.unet.pre_downsampling_conv[0], p["unet"]["pre0"],
             s["unet"]["pre0"])
    copy_cnr(tmod.unet.pre_downsampling_conv[1], p["unet"]["pre1"],
             s["unet"]["pre1"])
    for i in range(5):
        copy_cnr(tmod.unet.conv1[i], p["unet"][f"down{i}"],
                 s["unet"][f"down{i}"])
        copy_cnr(tmod.unet.conv2[i], p["unet"][f"up{i}"],
                 s["unet"][f"up{i}"])
    p["style_emb"]["embedding"] = jnp.asarray(
        tmod.style_emb.emb.weight.detach().numpy().copy())
    for i in range(6):
        copy_cnr(tmod.classify_cluster.conv[i],
                 p["classify_cluster"]["stack"][f"conv{i}"],
                 s["classify_cluster"]["stack"][f"conv{i}"])
    p["classify_cluster"]["logits"]["kernel"] = \
        t2j_conv1d(tmod.classify_cluster.logits.weight)
    p["classify_cluster"]["logits"]["bias"] = jnp.asarray(
        tmod.classify_cluster.logits.bias.detach().numpy().copy())
    for i in range(4):
        copy_cnr(tmod.decoder[i], p[f"decoder{i}"], s[f"decoder{i}"])
    p["logits"]["kernel"] = t2j_conv1d(tmod.logits.weight)
    p["logits"]["bias"] = jnp.asarray(tmod.logits.bias.detach().numpy().copy())

    out = model.apply(variables, [jnp.asarray(audio)], jnp.asarray(y), sw,
                      input_modalities=["audio/log_mel_512"],
                      use_pose_input=False, train=False)
    with torch.no_grad():
        kwargs = dict(input_modalities=["audio/log_mel_512"],
                      style=torch.from_numpy(style_ids).long(),
                      sample_flag=1, description="test", epoch=0)
        labels = torch.zeros(2, T).long()
        ref_pose, internal = tmod([torch.from_numpy(audio), labels],
                                  torch.from_numpy(y), **kwargs)
    np.testing.assert_allclose(np.asarray(out["pose"]), ref_pose.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_training_step_loss_and_grad_parity():
    """G-step training dynamics vs the reference: with identical weights and
    an identical batch, every loss component of the reference's G branch
    (gan.py:134-152 + jlcss4 internal losses) and the gradient of the output
    conv must match."""
    ref_jl = _load_ref("joint_late_cluster_soft_style")
    ref_s2g = _load_ref("speech2gesture")
    ref_gan = _load_ref("gan")
    import jax.numpy as jnp

    from mixstage_tpu.train import losses as L
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    T, MEL, FEATS, M, S = 64, 128, 96, 4, 3
    B = 2
    shape = {"pose/data": [T, 104], "audio/log_mel_512": [T, MEL]}
    style_dict = {f"sp{i}": i for i in range(S)}

    tG = ref_jl.JointLateClusterSoftStyle4_G(
        time_steps=T, out_feats=FEATS, num_clusters=M,
        style_dict=style_dict, shape=shape).float()
    tD = ref_s2g.Speech2Gesture_D(in_channels=FEATS).float()
    # NOTE: GAN's ctor default is no_grad=True but the trainer passes
    # args.no_grad == False (trainer.py:1085); match the trainer
    tgan = ref_gan.GAN(tG, tD, dg_iter_ratio=0.0, criterion="L1Loss",
                       input_modalities=["audio/log_mel_512"],
                       no_grad=False).float()
    tgan.train(True)
    randomize_bn_stats(tgan)
    # force the audio branch of the curriculum (coin: rand > thresh)
    tG.thresh.value = 1.0
    tG.thresh.iters = tG.thresh.num_iters

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=M, num_speakers=S,
                     lambda_gan=1.0, lambda_id=1.0)
    factory = StepFactory(cfg, donate=False)

    rng = np.random.default_rng(5)
    audio = rng.normal(size=(B, T, MEL)).astype(np.float32)
    y = rng.normal(size=(B, T, FEATS)).astype(np.float32)
    labels = rng.integers(0, M, size=(B, T))
    style_ids = np.repeat(rng.integers(0, S, size=(B, 1)), T, 1)
    batch = {"x": (jnp.asarray(audio),), "y": jnp.asarray(y),
             "labels": jnp.asarray(labels, jnp.int32),
             "style": jnp.asarray(style_ids, jnp.int32)}

    state = factory.init(jax.random.key(0), batch)
    # copy torch weights into both the generator tree and the psenc tree
    gp = jax.tree.map(np.asarray, state.g_params)
    gs = jax.tree.map(np.asarray, state.g_state)
    dp = jax.tree.map(np.asarray, state.d_params)
    ds = jax.tree.map(np.asarray, state.d_state)
    p, s = gp["gen"], gs["gen"]
    for i in range(8):
        copy_cnr(tG.audio_encoder.conv[i], p["audio_encoder"][f"conv{i}"],
                 s["audio_encoder"][f"conv{i}"])
    copy_cnr(tG.unet.pre_downsampling_conv[0], p["unet"]["pre0"], s["unet"]["pre0"])
    copy_cnr(tG.unet.pre_downsampling_conv[1], p["unet"]["pre1"], s["unet"]["pre1"])
    for i in range(5):
        copy_cnr(tG.unet.conv1[i], p["unet"][f"down{i}"], s["unet"][f"down{i}"])
        copy_cnr(tG.unet.conv2[i], p["unet"][f"up{i}"], s["unet"][f"up{i}"])
    p["style_emb"]["embedding"] = jnp.asarray(tG.style_emb.emb.weight.detach().numpy().copy())
    for i in range(6):
        copy_cnr(tG.classify_cluster.conv[i],
                 p["classify_cluster"]["stack"][f"conv{i}"],
                 s["classify_cluster"]["stack"][f"conv{i}"])
    p["classify_cluster"]["logits"]["kernel"] = t2j_conv1d(tG.classify_cluster.logits.weight)
    p["classify_cluster"]["logits"]["bias"] = jnp.asarray(
        tG.classify_cluster.logits.bias.detach().numpy().copy())
    for i in range(4):
        copy_cnr(tG.decoder[i], p[f"decoder{i}"], s[f"decoder{i}"])
    p["logits"]["kernel"] = t2j_conv1d(tG.logits.weight)
    p["logits"]["bias"] = jnp.asarray(tG.logits.bias.detach().numpy().copy())
    # pose-style encoder
    for i in range(7):
        copy_cnr(tG.pose_style_encoder.conv[i],
                 gp["psenc"]["stack"][f"conv{i}"], gs["psenc"]["stack"][f"conv{i}"])
    # discriminator
    dp["conv1"]["kernel"] = t2j_conv1d(tD.conv1[0].weight)
    dp["conv1"]["bias"] = jnp.asarray(tD.conv1[0].bias.detach().numpy().copy())
    copy_cnr(tD.conv2[0], dp["conv2_0"], ds["conv2_0"])
    copy_cnr(tD.conv3, dp["conv3"], ds["conv3"])
    dp["logits"]["kernel"] = t2j_conv1d(tD.logits.weight)
    dp["logits"]["bias"] = jnp.asarray(tD.logits.bias.detach().numpy().copy())
    state = state.replace(g_params=gp, g_state=gs, d_params=dp, d_state=ds)

    # ---- reference G branch -------------------------------------------------
    kwargs = dict(input_modalities=["audio/log_mel_512"],
                  style=torch.from_numpy(style_ids).long(), sample_flag=0,
                  description="train", epoch=0)
    ta = torch.from_numpy(audio)
    tl = torch.from_numpy(labels).long()
    ty = torch.from_numpy(y)
    tgan.zero_grad()
    y_cap, internal, *_ = tgan([ta, tl], ty, **kwargs)
    # order: pose, G_gan, label CE, id_in, id_out (gan.py:145-151 + jlcss4)
    ref_losses = [float(l) for l in internal]
    sum(internal).backward()
    ref_grad = tG.logits.weight.grad.detach().numpy().transpose(2, 1, 0)

    # ---- rebuild G step -----------------------------------------------------
    def loss_fn(g_params):
        pose, internal, g_state, aux = factory._style_forward(
            g_params, state.g_state, batch, False, True, False,
            jax.random.key(0))
        fake_v = L.velocity(pose)
        d_score, _ = factory._apply_disc(state.d_params, state.d_state,
                                         fake_v, True)
        # reference uses the trainer criterion (L1) for the GAN term too
        # (gan.py:40,69-71 with criterion='L1Loss')
        G_gan = factory.criterion(d_score, jnp.ones_like(d_score)).mean()
        pose_loss = factory.criterion(pose, batch["y"]).mean()
        total = pose_loss + G_gan + sum(internal.values())
        parts = {"pose": pose_loss, "G_gan": G_gan, **internal}
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.g_params)

    assert abs(float(parts["pose"]) - ref_losses[0]) < 2e-3
    assert abs(float(parts["G_gan"]) - ref_losses[1]) < 2e-3
    assert abs(float(parts["label"]) - ref_losses[2]) < 2e-3
    assert abs(float(parts["id_in"]) - ref_losses[3]) < 2e-3
    assert abs(float(parts["id_out"]) - ref_losses[4]) < 2e-3
    my_grad = np.asarray(grads["gen"]["logits"]["kernel"])
    # gradient parity on the output conv (direction + scale)
    cos = (my_grad * ref_grad).sum() / (
        np.linalg.norm(my_grad) * np.linalg.norm(ref_grad) + 1e-12)
    assert cos > 0.99, f"gradient cosine {cos}"
