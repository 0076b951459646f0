"""Jitted train/eval step functions — the core TPU runtime.

This module replaces the reference's stateful trainer-forward machinery:

* ``GAN.forward`` alternating D/G coin (``/root/reference/src/model/gan.py:86-164``)
  becomes two separately-jitted step functions selected by a host-side coin —
  identical semantics to the reference's ``torch.rand(1).item()`` host coin,
  and trivially replica-consistent under data parallelism;
* generator/discriminator batch-norm *mode* fidelity is preserved exactly:
  during the D step G runs in eval (running stats, no stat updates, gan.py:106-110);
  during the G step D runs in train mode so its stats update from fakes even
  though only G's optimizer steps (torch semantics of gan.py:135-146);
* the curriculum pose-vs-audio input coin (jlcss4.py:127-129) is host-flipped
  and passed static, giving two compiled G-step variants;
* ``some_grad`` on the pose-style encoder for the id_out loss
  (jlcss4.py:197-205) is a ``jax.lax.stop_gradient`` on that param subtree.

Loss-order parity with trainer.py loss_kinds (:1388-1394):
['pose', 'G_gan', 'real_D', 'fake_D', 'label', 'id_in', 'id_out'].
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mixstage_tpu.models.layers import PoseStyleEncoder
from mixstage_tpu.models.registry import get_model_def
from mixstage_tpu.train import losses as L
from mixstage_tpu.train.state import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (compile-time) configuration of the step functions."""

    model: str = "Speech2Gesture_G"
    gan: bool = False
    criterion: str = "L1Loss"
    input_modalities: Tuple[str, ...] = ("audio/log_mel_512",)
    time_steps: int = 64
    out_feats: int = 96
    # mixture / style
    num_clusters: Optional[int] = None
    num_speakers: int = 1
    style_dim: int = 10
    text_channels: Optional[int] = None
    lambda_id: float = 1.0
    train_only: bool = False
    softmax: bool = True
    argmax: bool = False
    some_grad_flag: bool = False
    curriculum_iters: int = 1000
    # Disentangle composition: internal-loss weight dict (items), forwarded
    # to the generator like reference update_modelKwargs (trainer.py:1434)
    style_losses: Tuple = ()
    # gan knobs (gan.py:18-45)
    discriminator: Optional[str] = None  # None infers <model prefix>_D
    dg_iter_ratio: float = 1.0
    lambda_gan: float = 1.0
    lambda_D: float = 1.0
    joint: bool = False
    no_grad: bool = False
    weighted: bool = False
    # training
    lr: float = 1e-4
    # torch-style criterion / optimizer construction kwargs, as items
    # (reference -lossKwargs / -optimKwargs, trainer.py:219,278-283)
    loss_kwargs: Tuple = ()
    optim_kwargs: Tuple = ()
    optim: str = "Adam"
    noise: float = 0.0
    optim_separate: Optional[float] = None
    # store Adam first moments in this dtype ('bfloat16' halves optimizer
    # HBM traffic, ~3-5% step time; None = param dtype for exact parity)
    optim_mu_dtype: Optional[str] = None
    # run the mixture decoder's TRAIN-mode fwd+bwd as fused Pallas kernels
    # (ops/pallas/train_decoder.py): weights consumed as stored (no XLA
    # repacking), activations VMEM-resident.  Opt-in fast path, bf16-oriented;
    # requires p_dropout == 0 and the JointLateClusterSoftStyle4 decoder shape
    fused_decoder: bool = False
    # per-layer TPU relowering plan for the audio conv pyramid:
    # 'native' | 'tpu' | explicit 8-entry comma list (exact math, same
    # params — purely a perf knob; layers.resolve_audio_lowerings)
    audio_lowering: Optional[str] = None
    p_dropout: float = 0.0
    dtype: Any = jnp.float32
    model_kwargs: Tuple = ()

    @property
    def is_classifier(self) -> bool:
        return "Classifier" in self.model

    @property
    def has_cluster(self) -> bool:
        return self.num_clusters is not None and "Cluster" in self.model

    @property
    def has_style(self) -> bool:
        return "Style" in self.model and not self.is_classifier

    @property
    def d_prob(self) -> float:
        r = self.dg_iter_ratio
        return r / (r + 1.0)


def capabilities_from_name(model: str, gan: int) -> str:
    """Compose the trainer-kind string exactly like the reference's
    trainer_chooser (trainer_chooser.py:4-26)."""
    kind = "Trainer"
    for key in ["Joint", "Late", "Cluster", "Style", "Disentangle"]:
        if key in model:
            kind += key
    if gan:
        kind += "GAN"
    if "Classifier" in model:
        kind += "Classifier"
    return kind


class StepFactory:
    """Builds jitted init/train/eval step functions for a StepConfig."""

    def __init__(self, cfg: StepConfig, g_schedule=None, d_schedule=None,
                 donate: bool = True):
        self.cfg = cfg
        self.donate = donate
        # fp64 parity mode stores params in f64 too; f32/bf16 keep f32 params
        param_dtype = jnp.float64 if cfg.dtype == jnp.float64 else jnp.float32
        common = dict(p=cfg.p_dropout, dtype=cfg.dtype, param_dtype=param_dtype)
        gen_cls = get_model_def(cfg.model)
        mk = dict(cfg.model_kwargs)
        if "Disentangle" in cfg.model:
            mk.setdefault("style_losses", dict(cfg.style_losses))
        if cfg.audio_lowering and \
                "audio_lowerings" in getattr(gen_cls, "__dataclass_fields__", {}):
            from mixstage_tpu.models.layers import resolve_audio_lowerings
            mk.setdefault("audio_lowerings",
                          resolve_audio_lowerings(cfg.audio_lowering))
        if cfg.has_style:
            self.gen = gen_cls(time_steps=cfg.time_steps, out_feats=cfg.out_feats,
                               num_clusters=cfg.num_clusters or 1,
                               num_speakers=cfg.num_speakers,
                               style_dim=cfg.style_dim,
                               text_channels=cfg.text_channels, **common, **mk)
            self.psenc = PoseStyleEncoder(input_channels=cfg.out_feats,
                                          num_speakers=cfg.num_speakers, **common)
        elif cfg.is_classifier:
            self.gen = gen_cls(time_steps=cfg.time_steps,
                               in_channels=cfg.out_feats,
                               num_speakers=cfg.num_speakers, **common, **mk)
            self.psenc = None
        else:
            self.gen = gen_cls(time_steps=cfg.time_steps,
                               out_feats=cfg.out_feats, **common, **mk)
            self.psenc = None
        if cfg.gan:
            from mixstage_tpu.models.registry import infer_discriminator_name
            # explicit -discriminator flag wins; otherwise infer
            # <model prefix>_D and fall back to Speech2Gesture_D when that
            # name is undefined (reference trainer.py:1052-1055,1075-1078)
            d_name = cfg.discriminator or infer_discriminator_name(cfg.model)
            try:
                d_cls = get_model_def(d_name)
            except (KeyError, NotImplementedError):
                # the reference uses a bare except here, so even an undefined
                # Disentangle _D name falls back rather than failing
                print(f"{d_name} not defined, hence defaulting to "
                      "Speech2Gesture_D")
                d_cls = get_model_def("Speech2Gesture_D")
            d_in = cfg.out_feats
            if cfg.joint:
                # D also sees the inputs (trainer.py:1066-1071)
                d_in += sum({"audio/log_mel_512": 128, "audio/log_mel_400": 64,
                             "text/w2v": 300, "text/bert": 768}.get(m, 0)
                            for m in cfg.input_modalities)
            self.disc = d_cls(in_channels=d_in,
                              out_shape=2 if cfg.weighted else 1, **common)
        else:
            self.disc = None
        self.criterion = L.get_criterion(cfg.criterion,
                                         **dict(cfg.loss_kwargs))
        from mixstage_tpu.train.state import translate_optim_kwargs
        opt_kw = translate_optim_kwargs(dict(cfg.optim_kwargs))
        if cfg.optim_mu_dtype and cfg.optim in ("Adam", "AdamW"):
            opt_kw["mu_dtype"] = cfg.optim_mu_dtype
        self.g_tx = make_optimizer(cfg.optim, cfg.lr, grad_clip=1.0,
                                   schedule=g_schedule,
                                   text_lr=cfg.optim_separate, **opt_kw)
        self.d_tx = make_optimizer(cfg.optim, cfg.lr, grad_clip=1.0,
                                   schedule=d_schedule, **opt_kw) \
            if cfg.gan else None

    # ------------------------------------------------------------------ init
    def init(self, rng, batch) -> TrainState:
        cfg = self.cfg
        rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        g_params, g_state = {}, {}
        if cfg.has_style:
            sw = jnp.zeros(batch["y"].shape[:2] + (cfg.num_speakers,), cfg.dtype)
            gv = self.gen.init(rngs, list(batch["x"]), batch["y"], sw,
                               input_modalities=list(cfg.input_modalities),
                               use_pose_input=False, train=False)
            pv = self.psenc.init(rngs, batch["y"], train=False)
            g_params = {"gen": gv["params"], "psenc": pv["params"]}
            g_state = {"gen": gv.get("batch_stats", {}),
                       "psenc": pv.get("batch_stats", {})}
        elif cfg.is_classifier:
            # the classifier consumes the (masked) pose itself
            # (reference trainer.py:1326-1338)
            gv = self.gen.init(rngs, batch["y"], None, train=False)
            g_params = {"gen": gv["params"]}
            g_state = {"gen": gv.get("batch_stats", {})}
        else:
            x = self._fuse_inputs(batch["x"])
            gv = self.gen.init(rngs, x, batch["y"], train=False)
            g_params = {"gen": gv["params"]}
            g_state = {"gen": gv.get("batch_stats", {})}

        d_params = d_state = d_opt = None
        if self.disc is not None:
            dv = self.disc.init(rngs, self._d_input(batch["y"], batch["x"]),
                                train=False)
            d_params, d_state = dv["params"], dv.get("batch_stats", {})
            d_opt = self.d_tx.init(d_params)
        return TrainState(g_params=g_params, g_state=g_state,
                          g_opt_state=self.g_tx.init(g_params),
                          d_params=d_params, d_state=d_state,
                          d_opt_state=d_opt)

    # --------------------------------------------------------------- helpers
    def _fuse_inputs(self, x_list):
        """Early fusion for single-stream models (trainer.py:996)."""
        if len(x_list) == 1:
            return x_list[0]
        return jnp.concatenate(list(x_list), axis=-1)

    def _d_input(self, pose, x_list):
        """Velocity (⊕ inputs when joint) fed to D (gan.py:47-52)."""
        v = L.velocity(pose)
        if self.cfg.joint:
            xs = [jnp.asarray(x) for x in x_list[:len(self.cfg.input_modalities)]]
            # audio/text streams are frame-aligned with pose after windowing
            xs = [x if x.shape[1] == v.shape[1] else
                  jax.image.resize(x, (x.shape[0], v.shape[1], x.shape[2]),
                                   "nearest") for x in xs]
            return jnp.concatenate([v] + xs, axis=-1)
        return v

    def _estimate_weights(self, d_params, d_state, real_v):
        """Per-sample importance weights from the 2-class discriminator.

        The reference selects a ``GANWeighted`` wrapper when -weighted is set
        (trainer.py:1059-1062) but never defines it (the flag would NameError
        upstream); we implement the documented intent: D has out_shape=2
        (trainer.py:1061) and samples the discriminator finds unconvincing as
        "real" get up-weighted in the sampler and down-weighted in the G loss
        (1/W, gan.py:145-147)."""
        score, _ = self.disc.apply({"params": d_params,
                                    "batch_stats": d_state}, real_v,
                                   train=False)
        p_real = jax.nn.softmax(score, axis=-1)[..., 1].mean(axis=1)
        W = 1.0 / jnp.clip(p_real, 1e-3, 1.0)
        return jax.lax.stop_gradient(jnp.clip(W, 0.1, 10.0))

    def _confidence_loss(self, batch, y, pose):
        """Additive Gaussian-entropy confidence loss when the batch carries
        pose/confidence (reference trainer.py:345-355, 645)."""
        if batch.get("confidence") is None:
            return jnp.zeros((), self.cfg.dtype)
        from mixstage_tpu.models.layers import confidence_entropy_loss

        conf = batch["confidence"].reshape(y.shape)
        return confidence_entropy_loss(y, pose, conf, beta=1.0,
                                       epsilon=0.5).mean()

    def _style_weights_train(self, psenc_score, T):
        """Broadcast per-window speaker scores over time and soft/hard select
        (jlcss4.py:158-167)."""
        cfg = self.cfg
        score = jnp.repeat(psenc_score[:, None, :], T, axis=1)
        if cfg.softmax:
            w = jax.nn.softmax(score, axis=-1)
            if cfg.argmax:
                w = jax.nn.one_hot(jnp.argmax(w, -1), cfg.num_speakers,
                                   dtype=score.dtype)
            return w
        return score

    def _apply_psenc(self, params, bstats, y, train):
        variables = {"params": params, "batch_stats": bstats}
        if train:
            score, mut = self.psenc.apply(variables, y, train=True,
                                          mutable=["batch_stats"])
            return score, mut["batch_stats"]
        return self.psenc.apply(variables, y, train=False), bstats

    def _apply_gen_style(self, params, bstats, batch, style_weights,
                         use_pose_input, train, rng):
        variables = {"params": params, "batch_stats": bstats}
        kwargs = dict(input_modalities=list(self.cfg.input_modalities),
                      use_pose_input=use_pose_input, train=train)
        if train and self.cfg.fused_decoder:
            return self._apply_gen_style_fused(variables, params, bstats,
                                               batch, style_weights, rng,
                                               kwargs)
        if train:
            out, mut = self.gen.apply(variables, list(batch["x"]), batch["y"],
                                      style_weights, mutable=["batch_stats"],
                                      rngs={"dropout": rng}, **kwargs)
            return out, mut["batch_stats"]
        out = self.gen.apply(variables, list(batch["x"]), batch["y"],
                             style_weights, **kwargs)
        return out, bstats

    def _apply_gen_style_fused(self, variables, params, bstats, batch,
                               style_weights, rng, kwargs):
        """Train-mode forward with the mixture decoder as fused Pallas
        fwd+bwd kernels (StepConfig.fused_decoder; ops/pallas/train_decoder).

        The backbone (encoders + UNet + cluster classifier) runs as the
        normal flax graph with mutable batch stats; the decoder runs as the
        custom-vjp kernel, and its BatchNorm running stats are updated here
        with the exact flax rule (ra = momentum*ra + (1-momentum)*batch,
        momentum 0.9, biased batch var)."""
        import jax.numpy as jnp

        from mixstage_tpu.ops.mixture import index_select_outputs
        from mixstage_tpu.ops.pallas.train_decoder import fused_decoder_train

        assert self.cfg.p_dropout == 0.0, \
            "-fused_decoder requires p_dropout == 0"
        (x_feat, labels_score, labels_cap_soft), mut = self.gen.apply(
            variables, list(batch["x"]), batch["y"], style_weights,
            method="backbone", mutable=["batch_stats"],
            rngs={"dropout": rng}, **kwargs)
        M = self.cfg.num_clusters
        xr, stats = fused_decoder_train(x_feat, params, M)
        pose = index_select_outputs(xr, labels_cap_soft, M)
        gen_bs = dict(mut["batch_stats"])
        for i, (mu, var) in enumerate(stats):
            old = gen_bs[f"decoder{i}"]["norm"]
            gen_bs[f"decoder{i}"] = {
                **gen_bs[f"decoder{i}"],
                "norm": {"mean": 0.9 * old["mean"] + 0.1 * mu,
                         "var": 0.9 * old["var"] + 0.1 * var}}
        out = {"pose": pose, "labels_score": labels_score,
               "labels_cap_soft": labels_cap_soft}
        return out, gen_bs

    def _apply_gen_simple(self, params, bstats, batch, train, rng):
        variables = {"params": params, "batch_stats": bstats}
        x = self._fuse_inputs(batch["x"])
        if train:
            (pose, internal), mut = self.gen.apply(
                variables, x, batch["y"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return pose, internal, mut["batch_stats"]
        pose, internal = self.gen.apply(variables, x, batch["y"], train=False)
        return pose, internal, bstats

    def _apply_disc(self, params, bstats, x, train):
        variables = {"params": params, "batch_stats": bstats}
        if train:
            (score, _), mut = self.disc.apply(variables, x, train=True,
                                              mutable=["batch_stats"])
            return score, mut["batch_stats"]
        (score, _) = self.disc.apply(variables, x, train=False)
        return score, bstats

    # ------------------------------------------------- generator forward core
    def _style_forward(self, g_params, g_state, batch, use_pose_input,
                       train, sample_flag, rng):
        """Full Mix-StAGE forward incl. style machinery and id/cluster losses
        (jlcss4.py:117-209).  Returns (pose, losses, new_g_state)."""
        cfg = self.cfg
        T = batch["y"].shape[1]
        new_state = dict(g_state)
        psenc_flag = (not sample_flag) and (train or not cfg.train_only)
        if psenc_flag:
            score, ps_bs = self._apply_psenc(g_params["psenc"],
                                             g_state["psenc"], batch["y"], train)
            new_state["psenc"] = ps_bs
            id_in = L.cross_entropy(score, batch["style"][:, 0])
            style_weights = self._style_weights_train(score, T)
        elif batch.get("style_soft") is not None:
            # explicit soft style weights: out-of-domain embeddings / style
            # mixtures (reference 'lin' path, jlcss4.py:172-173, -mix flag)
            id_in = jnp.zeros((), cfg.dtype)
            style_weights = batch["style_soft"].astype(cfg.dtype)
        else:
            id_in = jnp.zeros((), cfg.dtype)
            style_weights = jax.nn.one_hot(batch["style"].astype(jnp.int32),
                                           cfg.num_speakers, dtype=cfg.dtype)
        out, gen_bs = self._apply_gen_style(g_params["gen"], g_state["gen"],
                                            batch, style_weights,
                                            use_pose_input, train, rng)
        new_state["gen"] = gen_bs
        pose = out["pose"]

        label_loss = jnp.zeros((), cfg.dtype)
        if cfg.has_cluster and batch.get("labels") is not None:
            M = cfg.num_clusters
            label_loss = L.cross_entropy(
                out["labels_score"].reshape(-1, M),
                batch["labels"].reshape(-1))

        if psenc_flag:
            ps_params = g_params["psenc"]
            if cfg.some_grad_flag:
                ps_params = jax.tree.map(jax.lax.stop_gradient, ps_params)
            score_out, ps_bs2 = self._apply_psenc(ps_params,
                                                  new_state["psenc"],
                                                  pose, train)
            new_state["psenc"] = ps_bs2
            id_out = L.cross_entropy(score_out, batch["style"][:, 0])
        else:
            id_out = jnp.zeros((), cfg.dtype)

        losses = {"label": label_loss,
                  "id_in": id_in * cfg.lambda_id,
                  "id_out": id_out * cfg.lambda_id}
        # Disentangle composition: the generator emits its own named internal
        # losses (already style_losses-weighted); they join the total in both
        # the G branch and (stop-gradient'd) the D branch, exactly like the
        # reference's partial_i_loss (gan.py:129-131,149-151, summed by
        # calculate_loss trainer.py:1461-1474)
        losses.update(out.get("internal_losses", {}))
        aux = {"labels_cap_soft": out.get("labels_cap_soft")}
        return pose, losses, new_state, aux

    def _forward(self, g_params, g_state, batch, use_pose_input, train,
                 sample_flag, rng):
        """Dispatch to the model family; returns (pose, internal-losses dict,
        new_g_state, aux)."""
        if self.cfg.has_style:
            return self._style_forward(g_params, g_state, batch,
                                       use_pose_input, train, sample_flag, rng)
        pose, internal, gen_bs = self._apply_gen_simple(
            g_params["gen"], g_state["gen"], batch, train, rng)
        losses = {f"internal_{i}": l for i, l in enumerate(internal)}
        return pose, losses, {**g_state, "gen": gen_bs}, {}

    # ----------------------------------------------------------------- steps
    def make_steps(self):
        """Return dict of jitted step callables for this config."""
        cfg = self.cfg
        donate = (0,) if self.donate else ()
        if cfg.is_classifier:
            return {"train": jax.jit(self._classifier_step),
                    "eval": jax.jit(partial(self._classifier_step, train=False))}
        if not cfg.gan:
            train = jax.jit(self._simple_train_step,
                            static_argnames=("use_pose_input",),
                            donate_argnums=donate)
            return {"train": train,
                    "eval": jax.jit(self._eval_step,
                                    static_argnames=("use_pose_input",
                                                     "sample_flag"))}
        return {
            "g": jax.jit(self._g_step, static_argnames=("use_pose_input",),
                         donate_argnums=donate),
            "d": jax.jit(self._d_step, static_argnames=("use_pose_input",),
                         donate_argnums=donate),
            "eval": jax.jit(self._eval_step,
                            static_argnames=("use_pose_input", "sample_flag")),
        }

    # -- non-GAN ------------------------------------------------------------
    def _simple_train_step(self, state: TrainState, batch, rng,
                           use_pose_input: bool = False):
        cfg = self.cfg
        noise_rng, drop_rng = jax.random.split(rng)
        y = batch["y"]
        if cfg.noise > 0:
            y = y + cfg.noise * jax.random.normal(noise_rng, y.shape, y.dtype)
            batch = {**batch, "y": y}

        def loss_fn(g_params):
            pose, internal, g_state, aux = self._forward(
                g_params, state.g_state, batch, use_pose_input, True, False,
                drop_rng)
            pose_loss = self.criterion(pose, y).mean()
            conf_loss = self._confidence_loss(batch, y, pose)
            total = pose_loss + conf_loss + sum(internal.values())
            return total, (pose, internal, g_state, pose_loss)

        (total, (pose, internal, g_state, pose_loss)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
        updates, g_opt_state = self.g_tx.update(grads, state.g_opt_state,
                                                state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        new_state = state.replace(
            g_params=g_params, g_state=g_state, g_opt_state=g_opt_state,
            step=state.step + 1, g_step=state.g_step + 1,
            curriculum_step=state.curriculum_step + 1)
        losses = {"pose": pose_loss, "total": total, **internal}
        return new_state, losses, pose

    # -- GAN G step (gan.py:134-152) -----------------------------------------
    def _g_step(self, state: TrainState, batch, rng,
                use_pose_input: bool = False):
        cfg = self.cfg
        noise_rng, drop_rng = jax.random.split(rng)
        y = batch["y"]
        if cfg.noise > 0:
            y = y + cfg.noise * jax.random.normal(noise_rng, y.shape, y.dtype)
            batch = {**batch, "y": y}
        lambda_gan = L.lambda_schedule(state.lambda_step, cfg.lambda_gan)
        if cfg.weighted:
            W = self._estimate_weights(state.d_params, state.d_state,
                                       self._d_input(y, batch["x"]))
        else:
            W = jnp.ones((y.shape[0],), cfg.dtype)

        def loss_fn(g_params):
            pose, internal, g_state, aux = self._forward(
                g_params, state.g_state, batch, use_pose_input, True, False,
                drop_rng)
            fake_v = self._d_input(pose, batch["x"])
            # D runs in TRAIN mode during the G step (torch semantics of
            # gan.py:135-143): its batch stats update from the fakes.
            d_score, d_state = self._apply_disc(state.d_params, state.d_state,
                                                fake_v, True)
            if cfg.no_grad:
                d_score = jax.lax.stop_gradient(d_score)
            G_gan = lambda_gan * L.sample_wise_weight_mean(
                self.criterion(d_score, jnp.ones_like(d_score)), 1.0 / W)
            pose_loss = L.sample_wise_weight_mean(
                self.criterion(pose, y), 1.0 / W)
            conf_loss = self._confidence_loss(batch, y, pose)
            total = pose_loss + G_gan + conf_loss + sum(internal.values())
            return total, (pose, internal, g_state, d_state, pose_loss, G_gan)

        (total, (pose, internal, g_state, d_state, pose_loss, G_gan)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
        updates, g_opt_state = self.g_tx.update(grads, state.g_opt_state,
                                                state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        new_state = state.replace(
            g_params=g_params, g_state=g_state, g_opt_state=g_opt_state,
            d_state=d_state, step=state.step + 1, g_step=state.g_step + 1,
            lambda_step=state.lambda_step + 1,
            curriculum_step=state.curriculum_step + 1)
        losses = {"pose": pose_loss, "G_gan": G_gan, "total": total,
                  "W": W, **internal}
        return new_state, losses, pose

    # -- GAN D step (gan.py:105-132) -----------------------------------------
    def _d_step(self, state: TrainState, batch, rng,
                use_pose_input: bool = False):
        cfg = self.cfg
        noise_rng, drop_rng = jax.random.split(rng)
        y = batch["y"]
        if cfg.noise > 0:
            y = y + cfg.noise * jax.random.normal(noise_rng, y.shape, y.dtype)
            batch = {**batch, "y": y}
        lambda_D = L.lambda_schedule(state.lambda_step, cfg.lambda_D)
        if cfg.weighted:
            W = self._estimate_weights(state.d_params, state.d_state,
                                       self._d_input(y, batch["x"]))
        else:
            W = jnp.ones((y.shape[0],), cfg.dtype)

        # G in eval mode + no grad (gan.py:106-110): running stats, no updates
        pose, internal, _, aux = self._forward(
            state.g_params, state.g_state, batch, use_pose_input, False, False,
            drop_rng)
        pose = jax.lax.stop_gradient(pose)
        internal = jax.tree.map(jax.lax.stop_gradient, internal)
        fake_v = self._d_input(pose, batch["x"])
        real_v = self._d_input(y, batch["x"])

        def loss_fn(d_params):
            fake_score, d_state = self._apply_disc(d_params, state.d_state,
                                                   fake_v, True)
            real_score, d_state = self._apply_disc(d_params, d_state,
                                                   real_v, True)
            fake_D = lambda_D * L.sample_wise_weight_mean(
                self.criterion(fake_score, jnp.zeros_like(fake_score)),
                jnp.ones_like(W))
            real_D = L.sample_wise_weight_mean(
                self.criterion(real_score, jnp.ones_like(real_score)),
                jnp.ones_like(W))
            total = real_D + fake_D + sum(internal.values())
            return total, (d_state, real_D, fake_D)

        (total, (d_state, real_D, fake_D)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = self.d_tx.update(grads, state.d_opt_state,
                                                state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        new_state = state.replace(
            d_params=d_params, d_state=d_state, d_opt_state=d_opt_state,
            step=state.step + 1, lambda_step=state.lambda_step + 1)
        losses = {"real_D": real_D, "fake_D": fake_D, "total": total,
                  "W": W, **internal}
        return new_state, losses, pose

    # -- eval / sampling ------------------------------------------------------
    def _eval_step(self, state: TrainState, batch,
                   use_pose_input: bool = False, sample_flag: bool = False):
        pose, internal, _, aux = self._forward(
            state.g_params, state.g_state, batch, use_pose_input, False,
            sample_flag, jax.random.key(0))
        pose_loss = self.criterion(pose, batch["y"]).mean()
        losses = {"pose": pose_loss,
                  "total": pose_loss + sum(internal.values()), **internal}
        return losses, pose, aux

    # -- style classifier (TrainerStyleClassifier, trainer.py:1313-1341) ------
    def _classifier_step(self, state: TrainState, batch, rng=None,
                         train: bool = True):
        y_true = batch["style"][:, 0].astype(jnp.int32)

        def loss_fn(g_params):
            variables = {"params": g_params["gen"],
                         "batch_stats": state.g_state["gen"]}
            if train:
                (logits, _), mut = self.gen.apply(
                    variables, batch["y"], None, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng if rng is not None else jax.random.key(0)})
                bs = mut["batch_stats"]
            else:
                logits, _ = self.gen.apply(variables, batch["y"], None,
                                           train=False)
                bs = state.g_state["gen"]
            loss = L.cross_entropy(logits, y_true)
            return loss, (logits, bs)

        if not train:
            loss, (logits, _) = loss_fn(state.g_params)
            acc = (logits.argmax(-1) == y_true).mean()
            return {"pose": loss, "total": loss, "acc": acc}, logits, {}
        (loss, (logits, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        updates, g_opt_state = self.g_tx.update(grads, state.g_opt_state,
                                                state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        acc = (logits.argmax(-1) == y_true).mean()
        new_state = state.replace(g_params=g_params,
                                  g_state={**state.g_state, "gen": bs},
                                  g_opt_state=g_opt_state,
                                  step=state.step + 1, g_step=state.g_step + 1)
        return new_state, {"pose": loss, "total": loss, "acc": acc}, logits

    # -- fused multi-step training driver -------------------------------------
    def make_scan_train_step(self, k: int):
        """One dispatch = k sequential train steps via ``lax.scan``.

        Profiling on v5e shows the per-step path is dispatch/overhead-bound at
        small batch (step time is nearly flat from bs32 to bs256), so fusing k
        steps into one compiled program recovers the lost throughput while
        keeping *identical* SGD semantics: the scan body applies the same
        optimizer/batch-stat updates as the per-step functions, and the GAN
        D/G coins come in as a host-provided boolean array (replica-consistent
        like the per-step path).  Audio-input branch only — the curriculum
        phase (first ~1000 steps) should use the per-step path.

        Returns a jitted callable
        ``(state, stacked_batches, coins (k,), rngs (k,)) ->
          (state, stacked_losses, stacked_poses)``.
        """
        cfg = self.cfg

        def union_keys():
            keys = {"pose", "G_gan", "real_D", "fake_D", "total"}
            if cfg.has_style:
                keys |= {"label", "id_in", "id_out"}
            if "Disentangle" in cfg.model:
                from mixstage_tpu.models.registry import \
                    DISENTANGLE_INTERNAL_LOSSES
                keys |= set(DISENTANGLE_INTERNAL_LOSSES)
            if cfg.gan and cfg.weighted:
                keys |= {"W"}  # (B,) sample weights for host feedback
            return sorted(keys)

        keys = union_keys()

        def norm(losses):
            # f32 scalars regardless of compute dtype: the G and D branches
            # of the lax.cond must return identical output types even under
            # -dtype bfloat16
            zero = jnp.zeros((), jnp.float32)
            return {key: losses.get(key, zero).astype(jnp.float32)
                    for key in keys}

        def body(state, inp):
            batch, coin_d, rng = inp
            if cfg.gan:
                def d_branch(st):
                    st, losses, pose = self._d_step(st, batch, rng,
                                                    use_pose_input=False)
                    return st, (norm(losses), pose.astype(cfg.dtype))

                def g_branch(st):
                    st, losses, pose = self._g_step(st, batch, rng,
                                                    use_pose_input=False)
                    return st, (norm(losses), pose.astype(cfg.dtype))

                state, (losses, pose) = jax.lax.cond(coin_d, d_branch,
                                                     g_branch, state)
            else:
                state, losses, pose = self._simple_train_step(
                    state, batch, rng, use_pose_input=False)
                losses, pose = norm(losses), pose.astype(cfg.dtype)
            return state, (losses, pose)

        def scan_step(state, batches, coins, rngs):
            state, (losses, poses) = jax.lax.scan(
                body, state, (batches, coins, rngs))
            return state, losses, poses

        donate = (0,) if self.donate else ()
        return jax.jit(scan_step, donate_argnums=donate)
