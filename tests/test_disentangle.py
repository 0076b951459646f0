"""Disentangle trainer-composition plumbing (VERDICT round-1 item 8).

The reference defines ``TrainerLateClusterStyleDisentangleGAN`` with an
extended internal-loss vocabulary (reference trainer.py:1419-1474) but ships
no Disentangle generator — ``eval(args.model)`` would NameError upstream.
This suite pins our side of the contract:

* an unregistered Disentangle model fails loudly with the upstream-incomplete
  message (parity with the upstream NameError, but diagnosable);
* once a Disentangle generator is registered (``register_model``), the full
  loss plumbing works: the ``-style_losses`` weight dict reaches the model
  (reference update_modelKwargs, trainer.py:1427-1434), the model's named
  internal losses join the G-step total (gan.py:149-151) and — stop-gradient'd
  — the D-step total (gan.py:129-131), and the scan driver carries the
  extended loss keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mixstage_tpu.models.mix_stage import JointLateClusterSoftStyle4_G
from mixstage_tpu.models.registry import (DISENTANGLE_INTERNAL_LOSSES,
                                          DISENTANGLE_LOSS_KINDS,
                                          MODEL_REGISTRY, get_model_def,
                                          register_model)
from mixstage_tpu.models.speech2gesture import Speech2Gesture_D
from mixstage_tpu.train.steps import (StepConfig, StepFactory,
                                      capabilities_from_name)

B, T, MEL, FEATS = 2, 64, 128, 96


class JointLateClusterSoftStyleDisentangle9_G(JointLateClusterSoftStyle4_G):
    """Minimal Disentangle generator: the Mix-StAGE backbone emitting the
    reference's extended internal-loss vocabulary, weighted by the
    ``style_losses`` kwarg the trainer forwards."""

    style_losses: tuple = ()

    def __call__(self, x_list, y, style_weights, input_modalities,
                 use_pose_input=False, time_steps=None, train=True):
        out = super().__call__(x_list, y, style_weights, input_modalities,
                               use_pose_input=use_pose_input,
                               time_steps=time_steps, train=train)
        w = dict(self.style_losses)
        pose, score = out["pose"], out["labels_score"]
        losses = {}
        for i, name in enumerate(DISENTANGLE_INTERNAL_LOSSES):
            if name == "H":  # entropy term is unweighted (no style_losses key)
                p = nn.softmax(score, axis=-1)
                losses["H"] = -(p * jnp.log(p + 1e-8)).sum(-1).mean()
            else:
                losses[name] = w.get(name, 1.0) * \
                    jnp.abs(pose).mean() * (i + 1) / 100.0
        out["internal_losses"] = losses
        return out


def test_unregistered_disentangle_fails_loudly():
    with pytest.raises(NotImplementedError, match="upstream-incomplete"):
        get_model_def("JointLateClusterSoftStyleDisentangle7_G")


def test_capabilities_compose_disentangle():
    assert capabilities_from_name(
        "JointLateClusterSoftStyleDisentangle9_G", 1) == \
        "TrainerJointLateClusterStyleDisentangleGAN"


def test_loss_vocabulary_alignment():
    # display slots 4+ map 1:1 onto the internal loss names
    assert len(DISENTANGLE_LOSS_KINDS) - 4 == len(DISENTANGLE_INTERNAL_LOSSES)


@pytest.fixture(scope="module")
def disentangle_factory():
    register_model("JointLateClusterSoftStyleDisentangle9_G",
                   JointLateClusterSoftStyleDisentangle9_G)
    register_model("JointLateClusterSoftStyleDisentangle9_D",
                   Speech2Gesture_D)
    weights = {k: 1.0 for k in DISENTANGLE_INTERNAL_LOSSES if k != "H"}
    weights["content_+"] = 2.0
    cfg = StepConfig(model="JointLateClusterSoftStyleDisentangle9_G",
                     gan=True, criterion="L1Loss", num_clusters=4,
                     num_speakers=2,
                     style_losses=tuple(sorted(weights.items())))
    yield StepFactory(cfg, donate=False)
    MODEL_REGISTRY.pop("JointLateClusterSoftStyleDisentangle9_G", None)
    MODEL_REGISTRY.pop("JointLateClusterSoftStyleDisentangle9_D", None)


def make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    batch = {"x": (jnp.asarray(rng.normal(size=(B, T, MEL)), jnp.float32),),
             "y": jnp.asarray(rng.normal(size=(B, T, FEATS)), jnp.float32),
             "labels": jnp.asarray(rng.integers(0, cfg.num_clusters,
                                                size=(B, T))),
             "style": jnp.asarray(np.repeat(
                 rng.integers(0, cfg.num_speakers, size=(B, 1)), T, 1))}
    return batch


def test_style_losses_reach_model(disentangle_factory):
    assert dict(disentangle_factory.gen.style_losses)["content_+"] == 2.0


def test_g_step_sums_internal_losses(disentangle_factory):
    f = disentangle_factory
    batch = make_batch(f.cfg)
    state = f.init(jax.random.key(0), batch)
    steps = f.make_steps()
    _, losses, _ = steps["g"](state, batch, jax.random.key(1),
                              use_pose_input=False)
    for name in DISENTANGLE_INTERNAL_LOSSES:
        assert name in losses and np.isfinite(float(losses[name])), name
    parts = ["pose", "G_gan", "label", "id_in", "id_out",
             *DISENTANGLE_INTERNAL_LOSSES]
    assert np.isclose(float(losses["total"]),
                      sum(float(losses[p]) for p in parts), rtol=1e-5)
    # the style_losses weight scales its loss: content_+ (w=2, slot 0) is
    # exactly 2/(2*2) = 1x content_- (w=1, slot 1) under the stub's ramp
    assert np.isclose(float(losses["content_+"]),
                      float(losses["content_-"]), rtol=1e-5)


def test_d_step_carries_internal_losses(disentangle_factory):
    f = disentangle_factory
    batch = make_batch(f.cfg)
    state = f.init(jax.random.key(0), batch)
    steps = f.make_steps()
    new_state, losses, _ = steps["d"](state, batch, jax.random.key(1),
                                      use_pose_input=False)
    # internal losses appear in the D total too (gan.py:129-131) but must not
    # move G params (they are stop-gradient'd; D optimizer only sees d_params)
    parts = ["real_D", "fake_D", "label", "id_in", "id_out",
             *DISENTANGLE_INTERNAL_LOSSES]
    assert np.isclose(float(losses["total"]),
                      sum(float(losses[p]) for p in parts), rtol=1e-5)
    g_same = all(bool(jnp.all(a == b)) for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params),
        jax.tree_util.tree_leaves(new_state.g_params)))
    assert g_same


def test_discriminator_fallback_and_explicit_flag(capsys):
    """Inferred-D fallback to Speech2Gesture_D (reference trainer.py:1075-1078)
    and the explicit -discriminator override (trainer.py:1051-1055)."""
    register_model("JointLateClusterSoftStyleDisentangle8_G",
                   JointLateClusterSoftStyleDisentangle9_G)
    try:
        cfg = StepConfig(model="JointLateClusterSoftStyleDisentangle8_G",
                         gan=True, num_clusters=4, num_speakers=2)
        f = StepFactory(cfg, donate=False)
        assert type(f.disc).__name__ == "Speech2Gesture_D"
        assert "defaulting to Speech2Gesture_D" in capsys.readouterr().out
        cfg2 = StepConfig(model="JointLateClusterSoftStyleDisentangle8_G",
                          gan=True, num_clusters=4, num_speakers=2,
                          discriminator="Speech2Gesture_D")
        f2 = StepFactory(cfg2, donate=False)
        assert type(f2.disc).__name__ == "Speech2Gesture_D"
        assert "defaulting" not in capsys.readouterr().out
    finally:
        MODEL_REGISTRY.pop("JointLateClusterSoftStyleDisentangle8_G", None)


def test_scan_driver_carries_extended_keys(disentangle_factory):
    f = disentangle_factory
    k = 3
    batches = [make_batch(f.cfg, seed=i) for i in range(k)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state = f.init(jax.random.key(0), batches[0])
    scan_fn = f.make_scan_train_step(k)
    coins = jnp.asarray([True, False, False])
    rngs = jnp.stack([jax.random.key(i) for i in range(k)])
    _, losses, _ = scan_fn(state, stacked, coins, rngs)
    for name in DISENTANGLE_INTERNAL_LOSSES:
        assert name in losses and losses[name].shape == (k,), name
        assert np.isfinite(np.asarray(losses[name])).all()
