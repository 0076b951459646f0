"""Experiment lifecycle driver (host side).

Replaces the reference trainer hierarchy
(``/root/reference/src/model/trainer.py:48-1477``, 12 subclasses assembled by
name composition) with ONE trainer whose behaviour is derived from the same
model-name substrings + flags (see ``steps.capabilities_from_name``).  The
per-batch compute lives in jitted step functions (``train/steps.py``); this
class owns data, transforms, metrics, bookkeeping, the GAN/curriculum host
coins, sampling and style transfer.

TPU data parallelism: batches are device-put against a NamedSharding over the
data axis of a 1-D mesh and the train state is replicated; XLA inserts the
gradient all-reduces (psum) automatically from the sharding annotations
(SURVEY.md §5 — the reference is single-device).
"""

from __future__ import annotations

import itertools
import json
import sys
import pickle as pkl
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixstage_tpu.bookkeeping import BookKeeper
from mixstage_tpu.config import Config
from mixstage_tpu.data.dataset import Data, DataLoader
from mixstage_tpu.data.transforms import (Compose, KMeansTransform,
                                          Relative2Parent, RemoveJoints, ZNorm)
from mixstage_tpu import evaluation
from mixstage_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        replicate_state)
from mixstage_tpu.train.state import make_schedule
from mixstage_tpu.train.steps import StepConfig, StepFactory


def _expand_mask(mask) -> List[int]:
    """'range(x, y)' strings + ints → flat joint list (trainer.py:69)."""
    out = []
    for m in mask:
        if isinstance(m, int):
            out.append(m)
        else:
            out.extend(list(eval(m, {"range": range})))  # noqa: S307 - reference contract
    return out


class TrainingPreempted(RuntimeError):
    """A preemption signal (SIGTERM) arrived mid-training; the live state has
    already been checkpointed (``BookKeeper.save_preempt``) when this is
    raised.  ``cli.train`` turns it into exit code 75 (EX_TEMPFAIL) so
    cluster schedulers retry the same command, which auto-resumes."""


class Trainer:
    """Unified trainer with reference-equivalent behaviour per model family."""

    def __init__(self, args: Config, args_subset=None, args_dict_update=None):
        self.book = BookKeeper(args, args_subset,
                               args_dict_update=args_dict_update or {},
                               tensorboard=args.tb)
        self.args = args = self.book.args

        self.path2data = args.path2data
        self.speaker = args.speaker if isinstance(args.speaker, list) \
            else [args.speaker]
        self.modalities = args.modalities
        self.input_modalities = args.input_modalities or self.modalities[1:]
        self.output_modalities = args.output_modalities or self.modalities[:1]
        self.output_modality = self.output_modalities[0]
        self.mask = _expand_mask(args.mask)
        self.batch_size = args.batch_size
        self.time = args.time
        self.fs_new = args.fs_new if isinstance(args.fs_new, list) \
            else [args.fs_new] * len(self.modalities)
        self.window_hop = args.window_hop
        self.num_epochs = args.num_epochs
        self.num_clusters = args.num_clusters
        self.feats = args.feats
        self.style_iters = args.style_iters
        self.sample_all_styles = args.sample_all_styles
        self.fp = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                   "float64": jnp.float64}[args.dtype]
        if args.dtype == "float64":
            # fp64 parity mode vs the reference (trainer.py:138); CPU backend
            jax.config.update("jax_enable_x64", True)

        # ------------------------------------------------------------- data
        self.data = Data(self.path2data, self.speaker, self.modalities,
                         self.fs_new, time=self.time, split=args.split,
                         batch_size=self.batch_size,
                         shuffle=bool(args.shuffle),
                         window_hop=self.window_hop,
                         style_iters=self.style_iters,
                         num_training_sample=args.num_training_sample,
                         load_data=bool(args.load_data),
                         sample_all_styles=self.sample_all_styles,
                         repeat_text=args.repeat_text,
                         quantile_sample=args.quantile_sample,
                         quantile_num_training_sample=args.quantile_num_training_sample,
                         weighted=args.weighted, filler=args.filler,
                         num_training_iters=args.num_training_iters)
        self.data_train = self.data.train
        self.data_dev = self.data.dev
        self.data_test = self.data.test
        self.style_dict = self.data.style_dict
        self.data_shape = self.data.shape
        self.parents = self.data.modality_classes[self.output_modality].parents
        print("Data Loaded")

        # --------------------------------------------------------- transforms
        pre_dir = (Path(self.path2data) / "preprocessing").as_posix()
        self.cluster = None
        if self.num_clusters is not None:
            self.cluster = KMeansTransform(
                [self.output_modality], savepath=f"{pre_dir}/kmeans",
                key=self.speaker, data=self.data_train,
                num_clusters=self.num_clusters, mask=self.mask,
                feats=self.feats)
        pre_transforms = []
        pre_op = None
        if args.relative2parent:
            pre_transforms.append(Relative2Parent())
            pre_op = Compose(list(pre_transforms))
        hidden = ["text/tokens", "text/filler", "audio/silence"]
        znorm_modalities = [m for m in self.modalities if m not in hidden]
        pre_transforms.append(ZNorm(znorm_modalities, savepath=f"{pre_dir}/muvar",
                                    key=self.speaker, data=self.data_train,
                                    relative2parent=args.relative2parent,
                                    pre=pre_op))
        self.pre = Compose(pre_transforms)
        self.transform = Compose([RemoveJoints(self.mask, self.parents)])

        if args.preprocess_only:
            # reference exits after data preprocessing (trainer.py:131-133)
            print("Data Preprocessing done")
            raise SystemExit(1)

        # ------------------------------------------------------------- steps
        out_feats = self.data_shape[self.output_modality][-1] - 2 * len(self.mask)
        text_channels = None
        for key in ("text/w2v", "text/bert"):
            if key in self.data_shape:
                text_channels = self.data_shape[key][-1]
        mk = dict(args.modelKwargs or {})
        steps_per_epoch = max(len(self.data_train), 1)
        total_steps = steps_per_epoch * self.num_epochs
        schedule = make_schedule(args.scheduler, args.lr, args.gamma,
                                 args.scheduler_warmup_steps, total_steps,
                                 steps_per_epoch)
        self.step_cfg = StepConfig(
            model=args.model, gan=bool(args.gan), criterion=args.loss,
            input_modalities=tuple(self.input_modalities),
            time_steps=self.data_shape[self.input_modalities[0]][0],
            out_feats=out_feats, num_clusters=self.num_clusters,
            num_speakers=len(self.style_dict), style_dim=args.style_dim,
            text_channels=text_channels, lambda_id=mk.pop("lambda_id", 1.0),
            train_only=bool(mk.pop("train_only", 0)),
            softmax=bool(mk.pop("softmax", 1)),
            argmax=bool(mk.pop("argmax", 0)),
            some_grad_flag=bool(mk.pop("some_grad_flag", False)),
            style_losses=tuple(sorted((args.style_losses or {}).items())),
            discriminator=args.discriminator,
            dg_iter_ratio=args.dg_iter_ratio, lambda_gan=args.lambda_gan,
            lambda_D=args.lambda_D, joint=bool(args.joint),
            no_grad=bool(args.no_grad), weighted=bool(args.weighted),
            lr=args.lr, optim=args.optim, noise=args.noise,
            loss_kwargs=tuple(sorted((args.lossKwargs or {}).items())),
            optim_kwargs=tuple(sorted((args.optimKwargs or {}).items())),
            optim_separate=args.optim_separate,
            optim_mu_dtype=getattr(args, "optim_mu_dtype", None),
            fused_decoder=bool(getattr(args, "fused_decoder", 0)),
            audio_lowering=getattr(args, "audio_lowering", None),
            p_dropout=float(mk.pop("p", 0.0)), dtype=self.fp,
            model_kwargs=tuple(mk.items()))
        self.factory = StepFactory(self.step_cfg, g_schedule=schedule,
                                   d_schedule=schedule,
                                   donate=bool(args.donate))
        self.steps = self.factory.make_steps()
        self._scan_k = int(getattr(args, "scan_steps", 0) or 0)
        self._scan_step = (self.factory.make_scan_train_step(self._scan_k)
                           if self._scan_k > 1 else None)

        # ------------------------------------------------------- device mesh
        self.mesh = make_mesh(args.num_devices)
        self._schedule = schedule

        # --------------------------------------------------------- state/init
        self._coin = np.random.default_rng(args.seed or 0)
        self._preempted = False  # set by the SIGTERM handler, polled in loops
        # dynamic D/G coin probability (adapted when -update_D_prob_flag 1,
        # reference gan.py:44,97-98)
        self._d_prob = self.step_cfg.d_prob
        batch0 = self._peek_batch()
        self.state = self.factory.init(jax.random.key(args.seed or 0), batch0)
        self.state = replicate_state(self.state, self.mesh)
        self.book._copy_best_model(self.state)
        print("Model Created")
        if args.load:
            print("Loading Model")
            self.state = self.book._load_model(self.state)
            if args.save_optim:
                self.state = self.book._load_train_state(self.state)

        # ------------------------------------------------------------ metrics
        self.num_styles = len(self.style_dict)
        self._init_label_hist()
        self._init_metrics()
        self.weight_counter: Dict[int, int] = {}

    # ------------------------------------------------------------------ data
    def peek_batches(self, n_batches: int = 1, batch_size: int = 2):
        """First ``n_batches`` processed step-batches drawn across the
        train/dev/test loaders — the single copy of the "peek real data"
        iteration used by model init (``_peek_batch``) and the ``-serve_int8``
        activation calibration (``cli/serve.py``)."""
        out = []
        for loader in (self.data_train, self.data_dev, self.data_test):
            for batch in loader.iter_all(batch_size=batch_size):
                out.append(self.get_processed_batch(batch)[0])
                if len(out) >= n_batches:
                    return out
        if not out:
            raise RuntimeError("dataset is empty")
        return out

    def _peek_batch(self):
        return self.peek_batches(1, batch_size=2)[0]

    def get_processed_batch(self, batch):
        """Numpy batch → jitted-step batch (trainer.py:851-863 + cluster/style
        variants :1221-1239, :1360-1365).

        Returns ``(step_batch, y_unnormed, insert)`` — ``insert`` is THIS
        batch's removed joint slices, to be handed back to
        ``calculate_metrics``.  It must travel with the batch rather than
        through shared ``RemoveJoints`` state: prefetch workers, the scan
        driver's k-chunk, and the sampling metric worker all run forward
        passes ahead of the matching inverse, so shared state would pair a
        later batch's slices with an earlier batch's metrics (silent metric
        corruption at uniform batch sizes; a reshape crash on ragged ones —
        found by the round-4 TPU lifecycle burn-in in the quantile-finetune
        phase)."""
        labels = None
        if self.args.pos and "text/pos" in batch:
            # POS tag classes as cluster labels (reference -pos flag,
            # trainer.py:127-129, text.py:539-572)
            labels = np.asarray(batch["text/pos"], np.int64)
        elif self.cluster is not None:
            transform_cluster = Compose([RemoveJoints(self.mask)])
            labels = self.cluster(
                transform_cluster(np.asarray(batch[self.output_modality])))
        pre_batch = self.pre({k: v for k, v in batch.items()
                              if isinstance(v, np.ndarray)})
        x = [np.asarray(pre_batch[mod], np.float64)
             for mod in self.input_modalities]
        y_ = np.asarray(pre_batch[self.output_modality])
        rm = RemoveJoints(self.mask, self.parents)  # per-call: no shared state
        y = rm(y_)
        insert = rm.insert

        step_batch = {"x": tuple(np.asarray(x_, self.fp) for x_ in x),
                      "y": np.asarray(y, self.fp)}
        if "pose/confidence" in batch:
            conf = Compose([RemoveJoints(self.mask)])(
                np.asarray(batch["pose/confidence"]))
            step_batch["confidence"] = np.asarray(conf, self.fp)
        if labels is not None:
            step_batch["labels"] = np.asarray(labels, np.int32)
        if self.step_cfg.has_style or self.step_cfg.is_classifier:
            step_batch["style"] = np.asarray(batch["style"], np.int32)
        step_batch = shard_batch(step_batch, self.mesh)
        return step_batch, y_, insert

    # ----------------------------------------------------------------- coins
    def _curriculum_coin(self) -> bool:
        """Pose-input curriculum coin (jlcss4.py:127-129): P(pose input)
        decays 1→0 over curriculum_iters G-steps."""
        if not self.step_cfg.has_style:
            return False
        thresh = min(int(self.state.curriculum_step)
                     / max(self.step_cfg.curriculum_iters, 1), 1.0)
        return bool(self._coin.random() > thresh)

    def _gan_coin(self) -> bool:
        return bool(self._coin.random() < self._d_prob)

    def _maybe_update_d_prob(self, W):
        """-update_D_prob_flag feedback: adapt the D/G coin from the sample
        weights (see losses.adaptive_d_prob)."""
        if getattr(self.args, "update_D_prob_flag", 0):
            from mixstage_tpu.train.losses import adaptive_d_prob

            self._d_prob = adaptive_d_prob(self._d_prob, W,
                                           self.step_cfg.dg_iter_ratio)

    def _weighted_feedback(self, batch, W):
        """Per-sample weight → sampler feedback (trainer.py:622-625) +
        optional D_prob adaptation."""
        if hasattr(self.data_train.sampler, "weights"):
            idx = np.asarray(batch.get("idx", []))
            if idx.size:
                Wc = np.clip(np.asarray(W, np.float64), 0.1, None)
                self.data_train.sampler.weights[idx[:len(Wc)]] = Wc[:len(idx)]
        self._maybe_update_d_prob(np.asarray(W))

    # ------------------------------------------------------------------ train
    # ------------------------------------------------- preemption survival
    def request_preempt(self, signum=None, frame=None):
        """Signal-handler entry: flag only (async-signal-safe); the training
        loop checkpoints + raises at its next host-side step boundary."""
        self._preempted = True

    def _install_preempt_handler(self):
        if not getattr(self.args, "preempt_save", 0):
            return None
        import signal

        try:
            prev = signal.signal(signal.SIGTERM,
                                 lambda s, f: self.request_preempt(s, f))
            return (signal.SIGTERM, prev)
        except ValueError:  # not the main thread (embedded / test harness)
            return None

    def _check_preempt(self, epoch: int, where: str):
        """Poll the preemption flag at a host-side step boundary; on a hit,
        snapshot the LIVE state (weights + optimizer + counters) and unwind.

        Within-epoch progress is IN the snapshot; the resume re-enters the
        current epoch, so the only cost is that epoch's partial metrics."""
        if not (self._preempted and getattr(self.args, "preempt_save", 0)):
            return
        meta = {"epoch_next": int(epoch), "step": int(self.state.step),
                "reason": "SIGTERM", "time": time.asctime(),
                "best_dev_score": float(self.book.best_dev_score),
                "stop_count": int(self.book.stop_count)}
        self.book.log(f"preempted at {where}: checkpointing live state "
                      f"(epoch {epoch}, step {meta['step']})")
        self.book.save_preempt(self.state, meta)
        self.book._save_res()
        raise TrainingPreempted(where)

    def _maybe_resume_preempt(self) -> int:
        """Consume a preemption snapshot for this PREFIX, if any; returns the
        epoch to start from (0 on a fresh run)."""
        if not getattr(self.args, "preempt_save", 0):
            return 0
        out = self.book.load_preempt(self.state)
        if out is None:
            return 0
        self.state, meta = out
        self.book.best_dev_score = float(
            meta.get("best_dev_score", self.book.best_dev_score))
        self.book.stop_count = int(meta.get("stop_count", 0))
        epoch = int(meta.get("epoch_next", 0))
        self.book.log(f"resuming from preemption checkpoint "
                      f"(epoch {epoch}, step {meta.get('step', '?')})")
        self.book.clear_preempt()  # one-shot: a new signal writes a fresh one
        return epoch

    def train(self, exp_num):
        start_epoch = self._maybe_resume_preempt()
        handler = self._install_preempt_handler()
        try:
            self._train_epochs(exp_num, start_epoch)
        finally:
            if handler is not None:
                import signal

                signal.signal(*handler)

    def _train_epochs(self, exp_num, start_epoch=0):
        for epoch in range(start_epoch, self.num_epochs):
            self._check_preempt(epoch, f"epoch {epoch} start")
            train_loss, train_metrics, _ = self.train_loop(
                self.data_train, "train", epoch, num_iters=self.args.num_iters)
            dev_loss, dev_metrics, _ = self.train_loop(
                self.data_dev, "dev", num_iters=self.args.num_iters)
            test_loss, test_metrics, _ = self.train_loop(
                self.data_test, "test", num_iters=self.args.num_iters)

            if self.args.weighted:
                self._renormalize_sampler_weights()

            self.book.update_res({"train": train_loss, "dev": dev_loss,
                                  "test": test_loss})
            self.book.update_res(train_metrics)
            self.book.update_res(dev_metrics)
            self.book.update_res(test_metrics)
            self.book._save_res()
            if self.args.tb:
                # per-epoch loss/pck/spatialNorm scalars per split
                # (reference trainer.py:533-551)
                cpk = self.args.cpk
                scalars = [[f"{cpk}/train", train_loss, epoch],
                           [f"{cpk}/dev", dev_loss, epoch],
                           [f"{cpk}/test", test_loss, epoch]]
                for split, metrics in (("train", train_metrics),
                                       ("dev", dev_metrics),
                                       ("test", test_metrics)):
                    # tag order mirrors upstream exactly: pck_<split> but
                    # <split>_spatialNorm (trainer.py:537-551)
                    for tag, key in ((f"pck_{split}", f"{split}_pck"),
                                     (f"{split}_spatialNorm",
                                      f"{split}_spatialNorm")):
                        if key in metrics:
                            scalars.append([f"{cpk}/{tag}",
                                            metrics[key], epoch])
                self.book.update_tb({"scalar": scalars})
            self.book.print_res(
                epoch, key_order=["train", "dev", "test"],
                metric_order=self.metric_order, exp=exp_num,
                lr=float(self._schedule(int(self.state.step))))
            if self.book.stop_training(self.state, epoch):
                break

        if self.args.num_iters > 0:
            self.state = self.book._load_model(self.state)
            test_loss, test_metrics, _ = self.train_loop(self.data_test,
                                                         "test", 0)
            self.book.update_res({"test": test_loss})
            self.book.update_res(test_metrics)
            self.book._save_res()
        self.book.clear_preempt()  # clean completion: no stale snapshot

    def train_loop(self, data, desc, epoch=0, num_iters=0):
        from mixstage_tpu.train.profiling import StepTimer, trace

        self.metrics_reset()
        running = {"total": 0.0}
        running_count = 1e-10
        t0 = time.time()
        timer = StepTimer(desc)
        profile_ctx = trace(self.args.profile_dir
                            if desc == "train" and epoch == 0 else None)
        profile_ctx.__enter__()
        from mixstage_tpu.data.prefetch import prefetch

        # overlap host batch prep + device_put with device compute
        prepared = prefetch(data,
                            lambda b: (b, self.get_processed_batch(b)),
                            depth=2 if not self._scan_k else self._scan_k + 2,
                            workers=max(1, int(self.args.num_workers)))
        if desc == "train" and self._scan_step is not None:
            return self._train_loop_scan(prepared, desc, epoch, timer,
                                         profile_ctx, running, running_count,
                                         t0)
        for count, (batch, (step_batch, y_, insert)) in enumerate(prepared):
            if desc == "train":
                self._check_preempt(epoch, f"train step {count}")
            timer.start()
            if "idx" in batch:
                for i in np.asarray(batch["idx"]).tolist():
                    self.weight_counter[i] = self.weight_counter.get(i, 0) + 1

            B = step_batch["y"].shape[0]
            rng = jax.random.key(self._coin.integers(1 << 31))
            if desc == "train":
                if self.step_cfg.gan:
                    if self._gan_coin():
                        self.state, losses, y_cap = self.steps["d"](
                            self.state, step_batch, rng,
                            use_pose_input=self._curriculum_coin())
                    else:
                        self.state, losses, y_cap = self.steps["g"](
                            self.state, step_batch, rng,
                            use_pose_input=self._curriculum_coin())
                else:
                    out = self.steps["train"](self.state, step_batch, rng)
                    self.state, losses, y_cap = out
            else:
                losses, y_cap, aux = self.steps["eval"](self.state, step_batch)

            for k, v in losses.items():
                if np.ndim(v) == 0:
                    running[k] = running.get(k, 0.0) + float(v) * B
            running_count += B
            self._nan_guard(float(losses["total"]), f"{desc} step {count}")

            # weighted-GAN sampler feedback (trainer.py:622-625)
            if desc == "train" and self.args.weighted and "W" in losses:
                self._weighted_feedback(batch, losses["W"])

            if not self.step_cfg.is_classifier:
                y_cap = np.asarray(y_cap, np.float64)
                kwargs = {}
                if "style" in step_batch:
                    kwargs["style"] = np.asarray(step_batch["style"])
                self.calculate_metrics(y_cap, y_, "same", insert=insert,
                                       **kwargs)

            timer.stop()
            if self.args.debug and count >= self.args.debug:
                break
            if desc != "train" and num_iters > 0 and count >= num_iters:
                break
        profile_ctx.__exit__(None, None, None)

        loss_avg = running.get("pose", running["total"]) / running_count
        if self.args.metrics and not self.step_cfg.is_classifier:
            metrics, metrics_split = self.get_metrics(desc)
        elif self.step_cfg.is_classifier:
            metrics = {f"{desc}_acc": running.get("acc", 0.0) / running_count}
            metrics_split = {}
        else:
            metrics, metrics_split = {}, {}
        if desc == "train":
            dt = time.time() - t0
            metrics[f"{desc}_steps_per_sec"] = (count + 1) / max(dt, 1e-9)
            metrics.update(timer.summary(prefix=""))
        return loss_avg, metrics, metrics_split

    def _renormalize_sampler_weights(self):
        """Weighted-GAN sampler feedback (trainer.py:502-520)."""
        sampler = self.data_train.sampler
        if not hasattr(sampler, "weights"):
            return
        w = np.asarray(sampler.weights, np.float64)
        w = (w - w.mean()) / (w.std() + 1e-12) + 1
        w = np.clip(w, 0.1, 10.0)
        if np.isnan(w).any():
            w = np.ones_like(w)
        sampler.weights = w

    # ---------------------------------------------------------------- metrics
    def _stack_factory(self):
        args = self.args
        speakers = list(self.style_dict.keys())
        if args.mix and args.load:
            return partial(evaluation.Stack, n=len(speakers),
                           speakers=speakers, sample_styles=["mix"])
        if args.sample_all_styles != 0 and args.load:
            styles = ["same"] + ["_".join(p) for p in
                                 itertools.permutations(self.speaker, 2)]
            return partial(evaluation.Stack, n=len(speakers),
                           speakers=speakers, sample_styles=styles)
        if args.load:
            return partial(evaluation.Stack, n=len(speakers),
                           speakers=speakers, sample_styles=["same", "style"])
        return partial(evaluation.Stack, n=0, speakers=[],
                       sample_styles=["same"])

    def _init_metrics(self):
        Stack = self._stack_factory()
        feats_count = self.data_shape[self.output_modality][-1] // 2
        mean = self.pre.transforms[-1].variable_dict[self.output_modality][0]
        mean_masked = RemoveJoints(self.mask)(
            np.asarray(mean).reshape(1, 1, -1))[0, 0]
        self.pck = Stack(evaluation.PCK(num_joints=feats_count))
        self.l1 = Stack(evaluation.L1())
        self.vel_l1 = Stack(evaluation.VelL1())
        self.diversity = Stack(evaluation.Diversity(mean_masked))
        self.expressiveness = Stack(evaluation.Expressiveness(mean_masked))
        self.f1_cluster = KMeansTransform(
            [self.output_modality],
            savepath=(Path(self.path2data) / "preprocessing" / "kmeans").as_posix(),
            key=self.speaker, data=self.data_train, num_clusters=8,
            mask=self.mask, feats=self.feats, verbose=False)
        self.f1 = Stack(evaluation.F1(num_clusters=8))
        self.fid = Stack(evaluation.FID())
        self.w1 = Stack(evaluation.W1())
        self.metrics_objects = [self.pck, self.l1, self.vel_l1, self.diversity,
                                self.expressiveness, self.f1, self.fid, self.w1]
        self.IS = None
        if not self.args.pretrained_model:
            clf_fn = self._load_is_classifier()
            if clf_fn is not None:
                speakers_rev = {sp: i for i, sp in
                                enumerate(self.data.speakers)}
                weight = np.array([[speakers_rev[sp.split("|")[0]]]
                                   for sp in self.speaker])
                self.IS = Stack(evaluation.InceptionScoreStyle(
                    len(self.data.speakers), weight, clf_fn))
                self.metrics_objects.append(self.IS)

    def _load_is_classifier(self):
        """Jitted frozen StyleClassifier forward for the IS metric
        (metrics.py:305-321).  Returns None when no checkpoint is available
        (the reference's checkpoint blob is missing from its repo too)."""
        path = getattr(self.args, "pretrained_model_weights", None)
        if not path or not Path(path).exists():
            return None
        try:
            from flax import serialization

            from mixstage_tpu.models.style_classifier import StyleClassifier_G

            with open(path, "rb") as f:
                ckpt = serialization.msgpack_restore(f.read())
            params = ckpt["g_params"]["gen"]
            bstats = ckpt["g_state"].get("gen", {})
            n_speakers = len(self.data.speakers)
            clf = StyleClassifier_G(in_channels=self.step_cfg.out_feats,
                                    num_speakers=n_speakers, dtype=self.fp)

            @jax.jit
            def clf_fn(y):
                logits, _ = clf.apply({"params": params,
                                       "batch_stats": bstats}, y, None,
                                      train=False)
                return logits

            return lambda y: np.asarray(clf_fn(jnp.asarray(y, self.fp)))
        except Exception as e:
            print(f"IS classifier unavailable: {e}")
            return None

    def metrics_reset(self):
        for obj in self.metrics_objects:
            obj.reset()

    @property
    def metric_order(self):
        return ["pck", "F1", "style_IS"] if self.args.metrics else []

    def get_metrics(self, desc):
        metrics, metrics_split = {}, {}
        for metric in self.metrics_objects:
            avgs = metric.get_averages(desc)
            if isinstance(avgs, tuple):
                metrics.update(avgs[0])
                if not metrics_split:
                    metrics_split = {kn: {sp: {} for sp in avgs[1][kn]}
                                     for kn in avgs[1]}
                for kn in avgs[1]:
                    for sp in avgs[1][kn]:
                        metrics_split[kn][sp].update(avgs[1][kn][sp])
            else:
                metrics.update(avgs)
        return metrics, metrics_split

    def calculate_metrics(self, y_cap, y_, kwargs_name, insert=None,
                          **kwargs):
        """Metric cascade in znormed + raw spaces (trainer.py:865-915).

        ``insert``: the SAME batch's removed joint slices from
        ``get_processed_batch`` — required whenever forward passes can run
        ahead of this call (prefetch, scan chunks, the sampling metric
        worker); falling back to the shared transform state is only safe
        for strictly serial use."""
        if kwargs_name is None:
            kwargs_name = "same"
        if kwargs.get("style") is not None:
            idx = int(np.asarray(kwargs["style"]).reshape(-1)[0])
            style_vector = np.asarray(kwargs["style"])
        else:
            idx = 0
            style_vector = np.zeros((y_cap.shape[0], y_cap.shape[1]),
                                    np.int64)
        if self.IS is not None:
            try:
                self.IS(y_cap, style_vector, self.mask, idx=idx,
                        kwargs_name=kwargs_name)
            except Exception:
                pass

        y_cap_full = self.transform(y_cap, inv=True, batch_gt=y_,
                                    insert=insert)
        self.l1(y_cap_full, y_, self.mask, idx=idx, kwargs_name=kwargs_name)
        self.vel_l1(y_cap_full, y_, self.mask, idx=idx, kwargs_name=kwargs_name)
        self.fid(y_cap_full, y_, self.mask, idx=idx, kwargs_name=kwargs_name)

        y_cap_raw = self.pre({self.output_modality: y_cap_full},
                             inv=True)[self.output_modality]
        y_raw = self.pre({self.output_modality: np.asarray(y_)},
                         inv=True)[self.output_modality]
        B, T = y_cap_raw.shape[0], y_cap_raw.shape[1]
        y_cap_j = y_cap_raw.reshape(B, T, 2, -1)
        y_j = y_raw.reshape(B, T, 2, -1)
        self.w1(y_cap_j, y_j, self.mask, idx=idx, kwargs_name=kwargs_name)

        y_cap_f = y_cap_j.reshape(-1, 2, y_cap_j.shape[-1]).copy()
        y_f = y_j.reshape(-1, 2, y_j.shape[-1]).copy()
        y_cap_f[..., 0] = 0
        y_f[..., 0] = 0
        self.pck(y_cap_f, y_f, self.mask, idx=idx, kwargs_name=kwargs_name)

        rm = RemoveJoints(self.mask)
        y_cap_m = rm(y_cap_f.reshape(1, y_cap_f.shape[0], -1),
                     save_insert=False)[0]
        y_m = rm(y_f.reshape(1, y_f.shape[0], -1), save_insert=False)[0]
        self.diversity(y_cap_m, y_m, idx=idx, kwargs_name=kwargs_name)
        self.expressiveness(y_cap_m, y_m, idx=idx, kwargs_name=kwargs_name)
        self.f1(self.f1_cluster(y_cap_m[None]), self.f1_cluster(y_m[None]),
                idx=idx, kwargs_name=kwargs_name)
        # reference returns the raw root-zeroed (B*T, 2, joints) pose — the
        # array dumped to the keypoints h5 tree (trainer.py:899-915)
        return y_cap_f

    # ---------------------------------------------------------- label history
    def _init_label_hist(self):
        if self.num_clusters is None:
            return
        if self.sample_all_styles:
            kwargs_names = [f"{s1}_{s2}" for s2 in self.speaker
                            for s1 in self.speaker if s1 != s2]
        else:
            kwargs_names = ["style", "same"]
        descs = ["test", "train", "dev"]
        self.labels_hist = {kn: {d: {i: np.zeros(self.num_clusters)
                                     for i in range(self.num_styles)}
                                 for d in descs} for kn in kwargs_names}
        # chunk lists, concatenated once at save time — repeated
        # np.concatenate would make test-split accumulation O(N²)
        self.labels_hist_tensor = {
            kn: {d: {i: [np.zeros((1, self.num_clusters))]
                     for i in range(self.num_styles)}
                 for d in descs} for kn in kwargs_names}

    def _update_labels(self, labels_cap_soft, desc, style, kwargs_name):
        if self.num_clusters is None or labels_cap_soft is None:
            return
        if kwargs_name is None:
            kwargs_name = "same"
        if kwargs_name not in self.labels_hist:
            return
        soft = np.asarray(labels_cap_soft).reshape(-1, self.num_clusters)
        if desc == "test":
            self.labels_hist_tensor[kwargs_name][desc][style].append(soft)
        self.labels_hist[kwargs_name][desc][style] += np.bincount(
            soft.argmax(-1), minlength=self.num_clusters).astype(np.float64)

    def _save_labels(self):
        if self.num_clusters is None:
            return
        speakers = self.speaker
        hist = {kn: {d: {speakers[i]: self.labels_hist[kn][d][i].tolist()
                         for i in self.labels_hist[kn][d]}
                     for d in ["test", "train", "dev"]}
                for kn in self.labels_hist}
        json.dump(hist, open(self.book.name("histogram", "json",
                                            self.book.save_dir), "w"))
        tensors = {kn: {d: {speakers[i]:
                            np.concatenate(self.labels_hist_tensor[kn][d][i], 0)
                            for i in self.labels_hist_tensor[kn][d]}
                        for d in ["test", "train", "dev"]}
                   for kn in self.labels_hist_tensor}
        pkl.dump(tensors, open(self.book.name("style", "pkl",
                                              self.book.save_dir), "wb"))

    # ------------------------------------------------------------- experiment
    def start_exp(self):
        self.book._start_log()

    def finish_exp(self):
        self.book._stop_log()

    def get_gt(self, path2h5):
        from mixstage_tpu.data.hdf5 import HDF5

        Y = HDF5.load_array(path2h5, self.output_modality)
        feats_shape = self.data_shape[self.output_modality][-1] // 2
        Y = Y.reshape(-1, 2, feats_shape).copy()
        Y[..., 0] = 0
        return Y

    # -------------------------------------------------------------- sampling
    def update_kwargs_styles(self, style):
        """Yield (style_array, kwargs_name) per style-transfer target
        (trainer.py:1367-1386)."""
        if not self.step_cfg.has_style:
            yield style, None
            return
        style_id = int(np.asarray(style).reshape(-1)[0])
        if self.args.mix:
            # uniform mixture over all learned styles (reference -mix flag)
            yield style, None
            yield ("__mix__", "mix")
            return
        if self.sample_all_styles:
            yield style, None
            for shift in range(1, self.num_styles):
                target = (style + shift) % self.num_styles
                name = "{}_{}".format(self.speaker[style_id],
                                      self.speaker[(style_id + shift)
                                                   % self.num_styles])
                yield target, name
        else:
            yield style, None
            yield (style + 1) % self.num_styles, "style"

    def sample(self, exp_num):
        from mixstage_tpu.train.sampling import sample_loop

        self.dir_name = self.book.name.dir(self.args.save_dir)
        self.state = self.book._load_model(self.state)
        test_loss, test_metrics, test_split = sample_loop(self, "test")
        train_loss, train_metrics, _ = sample_loop(self, "train")
        dev_loss, dev_metrics, _ = sample_loop(self, "dev")
        if self.sample_all_styles == 0:
            self._save_labels()
            json.dump(test_split, open(self.book.name(
                "metrics", "json", self.book.save_dir), "w"))
            json.dump(test_metrics, open(self.book.name(
                "cummMetrics", "json", self.book.save_dir), "w"))
        print("Sampled- Train:{:.4f}/{:.4f}, Dev:{:.4f}/{:.4f}, "
              "Test:{:.4f}/{:.4f}".format(
                  train_loss, train_metrics.get("train_pck", 0.0),
                  dev_loss, dev_metrics.get("dev_pck", 0.0),
                  test_loss, test_metrics.get("test_pck", 0.0)))
        self.book.update_res({"train": train_loss, "dev": dev_loss,
                              "test": test_loss})
        self.book.update_res(train_metrics)
        self.book.update_res(dev_metrics)
        self.book.update_res(test_metrics)
        self.book.print_res(epoch=0, key_order=["train", "dev", "test"],
                            metric_order=self.metric_order, exp=exp_num, lr=0)
        if self.args.render:
            self.render_samples()

    def render_samples(self, max_videos: int = 10):
        """Render dumped keypoints to videos + HTML grid (the reference's
        -render flag path, render.py:19-132) for a bounded number of
        intervals."""
        from mixstage_tpu.animation.animation import animate
        from mixstage_tpu.htmlgrid.to_html import make_html_file

        exp_dir = Path(self.dir_name)
        feats_shape = self.data_shape[self.output_modality][-1] // 2
        rendered = 0
        for kp_dir in sorted(exp_dir.glob("keypoints*")):
            subname = kp_dir.name.replace("keypoints", "").lstrip("_") or None
            for h5file in sorted(kp_dir.rglob("*.h5")):
                if rendered >= max_videos:
                    break
                from mixstage_tpu.data.hdf5 import HDF5

                y_pred = HDF5.load_array(h5file.as_posix(),
                                         self.output_modality)
                if y_pred.ndim == 2:
                    y_pred = y_pred.reshape(-1, 2, feats_shape)
                desc = h5file.parent.parent.name
                animate(y_pred, h5file.stem, self.parents,
                        exp_dir.as_posix(), desc, self.data, None, None,
                        None, subname)
                rendered += 1
        make_html_file(exp_dir.as_posix())

    def _train_loop_scan(self, prepared, desc, epoch, timer, profile_ctx,
                         running, running_count, t0):
        """Fused k-step training loop: one dispatch per k batches
        (StepFactory.make_scan_train_step).  Used after the curriculum phase;
        curriculum batches fall back to the per-step path."""
        import jax

        k = self._scan_k
        if self.args.weighted and getattr(self.args, "update_D_prob_flag", 0):
            # The D/G coins for a whole chunk are flipped at chunk start, so
            # the adaptive D-prob (losses.adaptive_d_prob) would lag by up to
            # k steps at the recommended -scan_steps 64.  Cap the chunk at 8
            # so the coin probability is never more than 8 steps stale.
            # Sampler-weight feedback itself needs NO cap: the weighted
            # sampler draws the whole epoch's indices at __iter__ (both here
            # and in torch), so intra-epoch weight updates only influence the
            # NEXT epoch — any flush cadence lands before that boundary.
            # See ARCHITECTURE.md "Weighted-GAN feedback under scan".
            k = min(k, 8)
        pend = []
        count = 0

        def flush():
            nonlocal running_count, count
            if not pend:
                return
            if len(pend) < k or any(
                    p[1]["y"].shape != pend[0][1]["y"].shape for p in pend):
                # ragged tail or shape change: per-step path
                for batch, sb, y_, ins in pend:
                    self._one_train_step(batch, sb, y_, ins, running, epoch)
                    running_count += sb["y"].shape[0]
                    count += 1
                pend.clear()
                return
            batches = [p[1] for p in pend]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
            coins = np.array([self._gan_coin() if self.step_cfg.gan else False
                              for _ in range(k)])
            rngs = jnp.stack([jax.random.key(self._coin.integers(1 << 31))
                              for _ in range(k)])
            timer.start()
            self.state, losses, poses = self._scan_step(
                self.state, stacked, jnp.asarray(coins), rngs)
            timer.stop()
            B = batches[0]["y"].shape[0]
            totals = np.asarray(losses["total"])
            self._nan_guard(totals, f"train scan chunk (k={k})")
            for i, (batch, sb, y_, ins) in enumerate(pend):
                for key in losses:
                    v = np.asarray(losses[key][i])
                    if v.ndim == 0:
                        running[key] = running.get(key, 0.0) + float(v) * B
                running_count += B
                if self.args.weighted and "W" in losses:
                    self._weighted_feedback(batch, np.asarray(losses["W"][i]))
                if not self.step_cfg.is_classifier:
                    kwargs = {}
                    if "style" in sb:
                        kwargs["style"] = np.asarray(sb["style"])
                    self.calculate_metrics(np.asarray(poses[i], np.float64),
                                           y_, "same", insert=ins, **kwargs)
                count += 1
            pend.clear()

        in_curriculum = (self.step_cfg.has_style and
                         int(self.state.curriculum_step)
                         < self.step_cfg.curriculum_iters)
        for batch, (step_batch, y_, insert) in prepared:
            self._check_preempt(epoch, f"train scan batch {count}")
            if "idx" in batch:
                for i in np.asarray(batch["idx"]).tolist():
                    self.weight_counter[i] = self.weight_counter.get(i, 0) + 1
            if in_curriculum:
                self._one_train_step(batch, step_batch, y_, insert,
                                     running, epoch)
                running_count += step_batch["y"].shape[0]
                count += 1
                in_curriculum = (int(self.state.curriculum_step)
                                 < self.step_cfg.curriculum_iters)
            else:
                pend.append((batch, step_batch, y_, insert))
                if len(pend) == k:
                    flush()
            if self.args.debug and count >= self.args.debug:
                break
        flush()
        profile_ctx.__exit__(None, None, None)
        loss_avg = running.get("pose", running.get("total", 0.0)) / running_count
        if self.args.metrics and not self.step_cfg.is_classifier:
            metrics, metrics_split = self.get_metrics(desc)
        else:
            metrics, metrics_split = {}, {}
        dt = time.time() - t0
        metrics[f"{desc}_steps_per_sec"] = count / max(dt, 1e-9)
        metrics.update(timer.summary(prefix=""))
        return loss_avg, metrics, metrics_split

    def _nan_guard(self, total, where: str):
        """NaN-loss tripwire (reference trainer.py:642-643 drops into pdb).

        TPU adaptation: the loss lands host-side after the jitted step, so
        the guard runs here, not in the graph.  Interactive pdb only when
        the reference's debug affordance applies (a tty + -debug); headless
        runs get a loud FloatingPointError with the JAX_DEBUG_NANS pointer
        instead of a hung prompt.
        """
        if not np.isnan(total).any():
            return
        msg = (f"NaN train loss at {where} "
               f"(epoch counter {int(self.state.epoch_counter) if hasattr(self.state, 'epoch_counter') else '?'}). "
               "Re-run with JAX_DEBUG_NANS=1 (or jax.config.update("
               "'jax_debug_nans', True)) to trap the originating op.")
        self.book.log(msg)
        if self.args.debug and sys.stdin.isatty():
            import pdb
            pdb.set_trace()
        else:
            raise FloatingPointError(msg)

    def _one_train_step(self, batch, step_batch, y_, insert, running,
                        epoch):
        """Single per-step dispatch (shared by the scan loop's fallbacks)."""
        B = step_batch["y"].shape[0]
        rng = jax.random.key(self._coin.integers(1 << 31))
        if self.step_cfg.gan:
            fn = self.steps["d"] if self._gan_coin() else self.steps["g"]
            self.state, losses, y_cap = fn(self.state, step_batch, rng,
                                           use_pose_input=self._curriculum_coin())
        else:
            self.state, losses, y_cap = self.steps["train"](self.state,
                                                            step_batch, rng)
        for key, v in losses.items():
            if np.ndim(v) == 0:
                running[key] = running.get(key, 0.0) + float(v) * B
        self._nan_guard(float(losses["total"]), "train step (scan fallback)")
        if self.args.weighted and "W" in losses:
            self._weighted_feedback(batch, losses["W"])
        if not self.step_cfg.is_classifier:
            kwargs = {}
            if "style" in step_batch:
                kwargs["style"] = np.asarray(step_batch["style"])
            self.calculate_metrics(np.asarray(y_cap, np.float64), y_, "same",
                                   insert=insert, **kwargs)
