"""Experiment bookkeeping: naming, results, early stopping, checkpoints.

Re-provides the external ``pycasper.BookKeeper`` API the reference depends on
(SURVEY.md §1.1; usage at ``/root/reference/src/model/trainer.py:50-58,
523-569`` and ``train.py:37-41``), with the same experiment-file contract
(reference README.md:155-170):

  ``PREFIX = exp_<num>_cpk_<name>_speaker_<speaker>_model_<model>[_note_<note>]``
  ``PREFIX_args.args`` (json), ``PREFIX_res.json``, ``PREFIX_weights.p``
  (flax msgpack), ``PREFIX_log.log``, ``PREFIX_name.name``.

Checkpoints hold model weights + batch-norm state only (the reference never
checkpoints optimizer state, SURVEY.md §5).
"""

from __future__ import annotations

import glob
import json
import os
import random
import re
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from mixstage_tpu.config import Config, config_from_dict


class Name:
    """Experiment-name builder: callable → PREFIX-path (pycasper Name)."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def __call__(self, suffix: str, ext: str, save_dir: str) -> str:
        os.makedirs(save_dir, exist_ok=True)
        return (Path(save_dir) / f"{self.prefix}_{suffix}.{ext}").as_posix()

    def dir(self, save_dir: str) -> str:
        path = Path(save_dir) / self.prefix
        os.makedirs(path, exist_ok=True)
        return path.as_posix()


def _next_exp_num(save_dir: str) -> int:
    os.makedirs(save_dir, exist_ok=True)
    nums = []
    for f in os.listdir(save_dir):
        if f.startswith("exp_"):
            try:
                nums.append(int(f.split("_")[1]))
            except (IndexError, ValueError):
                pass
    return max(nums) + 1 if nums else 1


class BookKeeper:
    weights_ext = ("weights", "p")

    def __init__(self, args: Config, args_subset: Optional[List[str]] = None,
                 args_dict_update: Optional[Dict[str, Any]] = None,
                 tensorboard: Optional[int] = None):
        args_subset = args_subset or ["exp", "cpk", "speaker", "model", "note"]
        args_dict_update = dict(args_dict_update or {})

        self._restored_from_ckpt = False
        if getattr(args, "load", None):
            args = self._restore_args(args, args_dict_update)
        else:
            for k, v in args_dict_update.items():
                setattr(args, k, v)
        self.args = args

        if self.args.exp is None:
            self.args.exp = _next_exp_num(self.args.save_dir)
        parts = []
        for key in args_subset:
            val = getattr(self.args, key, None)
            if val is None:
                continue
            parts.append(f"{key}_{val}")
        self.name = Name("_".join(parts))
        self.save_dir = self.args.save_dir

        self.res: Dict[str, List[float]] = {}
        self.dev_sign = self.args.dev_sign
        self.dev_key = self.args.dev_key
        self.best_dev_score = np.inf * self.dev_sign
        self.stop_count = 0
        self._best_bytes: Optional[bytes] = None
        self._log_file = None
        # default to args.tb so BookKeeper(cfg) alone honours -tb 1
        self._tb = (getattr(self.args, "tb", 0)
                    if tensorboard is None else tensorboard)

        # persist args + name immediately (reference file contract) — but
        # never rewrite a restored experiment's stored args: that would bake
        # inference-time CLI overrides (window_hop=0, -render N, scratch
        # data paths) into the training record
        if not self._restored_from_ckpt:
            self.args.save(self.name("args", "args", self.save_dir))
            with open(self.name("name", "name", self.save_dir), "w") as f:
                f.write(self.name.prefix)

    # ------------------------------------------------------------- restore
    def _restore_args(self, args: Config, args_dict_update: Dict) -> Config:
        """Rebuild args from the checkpoint's ``_args.args`` file, then apply
        updates (reference sample.py:10-15 semantics)."""
        load_path = args.load
        # works for both PREFIX_weights.p files and PREFIX_weights.orbax dirs
        # (the orbax dir name is sanitized, so also try the raw prefix glob)
        args_file = re.sub(r"_weights\.(p|orbax)/?$", "_args.args", load_path)
        if not os.path.exists(args_file) and load_path.endswith(".orbax"):
            # the orbax dir name is char-sanitized; find the args file whose
            # sanitized name matches
            want = os.path.basename(args_file)
            for cand in glob.glob(os.path.join(os.path.dirname(load_path),
                                               "*_args.args")):
                s = os.path.basename(cand)
                for ch in "[]'\" ,":
                    s = s.replace(ch, "-")
                if s == want:
                    args_file = cand
                    break
        if os.path.exists(args_file):
            self._restored_from_ckpt = True
            restored = config_from_dict(json.load(open(args_file)))
            restored.load = load_path
            for k, v in args_dict_update.items():
                setattr(restored, k, v)
            return restored
        for k, v in args_dict_update.items():
            setattr(args, k, v)
        return args

    # ---------------------------------------------------------------- seeds
    def _set_seed(self):
        seed = self.args.seed
        if seed:
            np.random.seed(seed)
            random.seed(seed)
            os.environ["PYTHONHASHSEED"] = str(seed)
            print(f"Deterministic Mode!! Seed set to {seed}")

    # ----------------------------------------------------------------- logs
    def _start_log(self):
        self._log_file = open(self.name("log", "log", self.save_dir), "a")
        self._log_file.write(f"--- start {time.asctime()}\n")
        self._log_file.flush()

    def _stop_log(self):
        if self._log_file:
            self._log_file.write(f"--- stop {time.asctime()}\n")
            self._log_file.close()
            self._log_file = None

    def log(self, msg: str):
        print(msg)
        if self._log_file:
            self._log_file.write(msg + "\n")
            self._log_file.flush()

    # ----------------------------------------------------------- checkpoint
    @staticmethod
    def _state_to_ckpt(state) -> Dict[str, Any]:
        return {"g_params": state.g_params, "g_state": state.g_state,
                "d_params": state.d_params, "d_state": state.d_state}

    def _serialize(self, state) -> bytes:
        from flax import serialization

        return serialization.msgpack_serialize(
            {k: (v if v is not None else {})
             for k, v in self._state_to_ckpt(state).items()})

    def _copy_best_model(self, state):
        """Snapshot current weights as the running best (pycasper contract,
        called at trainer.py:142)."""
        self._best_bytes = self._serialize(state)

    def _save_model(self, state):
        if not self.args.save_model:
            return
        if getattr(self.args, "ckpt_backend", "msgpack") == "orbax":
            self._save_orbax(state)
            return
        self._best_bytes = self._serialize(state)
        with open(self.name(*self.weights_ext, self.save_dir), "wb") as f:
            f.write(self._best_bytes)
        if getattr(self.args, "save_optim", 0):
            self._save_train_state(state)

    # -- orbax backend (-ckpt_backend orbax): one atomic checkpoint directory
    # PREFIX_weights.orbax holding weights AND optimizer state/counters —
    # TPU-native alternative to the reference's single msgpack blob; supports
    # sharded arrays and survives partial writes (atomic rename on commit) ---
    def _orbax_path(self) -> str:
        # tensorstore's OCDBT kvstore silently fails to commit when the
        # directory name contains [ ] ' " or spaces (the PREFIX embeds the
        # speaker list, e.g. speaker_['oliver']) — sanitize those chars
        path = self.name("weights", "orbax", self.save_dir)
        head, tail = os.path.split(path)
        for ch in "[]'\" ,":
            tail = tail.replace(ch, "-")
        return os.path.abspath(os.path.join(head, tail))

    @staticmethod
    def _state_to_full_ckpt(state) -> Dict[str, Any]:
        import jax

        tree = {"model": {k: (v if v is not None else {})
                          for k, v in BookKeeper._state_to_ckpt(state).items()},
                "train": {"g_opt_state": state.g_opt_state,
                          "d_opt_state": (state.d_opt_state
                                          if state.d_opt_state is not None
                                          else {}),
                          "counters": {"step": state.step,
                                       "g_step": state.g_step,
                                       "lambda_step": state.lambda_step,
                                       "curriculum_step": state.curriculum_step}}}
        # fetch to host np so the snapshot is device-independent
        return jax.tree.map(np.asarray, tree)

    def _save_orbax(self, state):
        import shutil

        import orbax.checkpoint as ocp

        self._best_bytes = self._serialize(state)  # keep the in-memory best
        path = self._orbax_path()
        # Write-to-sibling-then-swap so a crash at ANY point leaves a
        # complete checkpoint on disk (either the old dir at `path`/`.old`
        # or the freshly committed one) — never rmtree the only copy first.
        tmp, old = path + ".tmp", path + ".old"
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, self._state_to_full_ckpt(state))
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    @staticmethod
    def _apply_full_ckpt(state, full, restore_optim: bool):
        import jax.numpy as jnp

        m = full["model"]
        state = state.replace(
            g_params=m["g_params"], g_state=m["g_state"],
            d_params=(m["d_params"] if state.d_params is not None else None),
            d_state=(m["d_state"] if state.d_state is not None else None))
        if restore_optim:
            t, c = full["train"], full["train"]["counters"]
            as_i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
            state = state.replace(
                g_opt_state=t["g_opt_state"],
                d_opt_state=(t["d_opt_state"]
                             if state.d_opt_state is not None else None),
                step=as_i32(c["step"]), g_step=as_i32(c["g_step"]),
                lambda_step=as_i32(c["lambda_step"]),
                curriculum_step=as_i32(c["curriculum_step"]))
        return state

    def _load_orbax(self, state, path: str):
        import orbax.checkpoint as ocp

        template = self._state_to_full_ckpt(state)
        with ocp.StandardCheckpointer() as ckptr:
            full = ckptr.restore(path, target=template)
        return self._apply_full_ckpt(
            state, full, restore_optim=bool(getattr(self.args,
                                                    "save_optim", 0)))

    # -- preemption survival (TPU-native addition; no reference counterpart:
    # pycasper only greedy-saves the BEST weights, so a preempted reference
    # job loses all progress since the last dev improvement) ---------------
    def _preempt_paths(self):
        return (self.name("preempt", "p", self.save_dir),
                self.name("preempt", "json", self.save_dir))

    def save_preempt(self, state, meta: Dict[str, Any]):
        """Atomically snapshot the LIVE training state (weights + optimizer +
        counters) + host loop metadata on a preemption signal.

        Written to a SEPARATE ``PREFIX_preempt.p`` so the greedy-saved best
        model (``PREFIX_weights.p``) is never overwritten by a mid-training
        state; a rerun of the same command consumes and clears it.
        """
        from flax import serialization

        # to_bytes → to_state_dict first: optimizer pytrees hold namedtuples
        # raw msgpack cannot encode
        blob = serialization.to_bytes(self._state_to_full_ckpt(state))
        p_state, p_meta = self._preempt_paths()
        with open(p_meta, "w") as f:
            json.dump(meta, f, indent=2)
        tmp = p_state + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p_state)  # snapshot becomes visible only when whole

    def load_preempt(self, state):
        """``(state, meta)`` from a preemption snapshot, or ``None``.

        Restores the FULL state (optimizer + counters included,
        independent of ``-save_optim`` — exact resume is the point).
        """
        from flax import serialization

        p_state, p_meta = self._preempt_paths()
        if not os.path.exists(p_state):
            return None
        template = self._state_to_full_ckpt(state)
        with open(p_state, "rb") as f:
            full = serialization.from_bytes(template, f.read())
        meta = json.load(open(p_meta)) if os.path.exists(p_meta) else {}
        return self._apply_full_ckpt(state, full, restore_optim=True), meta

    def clear_preempt(self):
        for path in self._preempt_paths():
            if os.path.exists(path):
                os.remove(path)

    # -- full-state checkpoints (improvement over the reference, which only
    # saves weights — SURVEY.md §5) --------------------------------------
    def _save_train_state(self, state):
        from flax import serialization

        full = {"g_opt_state": state.g_opt_state,
                "d_opt_state": state.d_opt_state,
                "counters": {"step": state.step, "g_step": state.g_step,
                             "lambda_step": state.lambda_step,
                             "curriculum_step": state.curriculum_step}}
        payload = serialization.to_bytes(full)
        with open(self.name("trainstate", "p", self.save_dir), "wb") as f:
            f.write(payload)

    def _load_train_state(self, state):
        """Restore optimizer state + counters on top of a weights restore;
        returns the state unchanged when no trainstate file exists."""
        from flax import serialization

        path = self.name("trainstate", "p", self.save_dir)
        if not os.path.exists(path):
            return state
        full = {"g_opt_state": state.g_opt_state,
                "d_opt_state": state.d_opt_state,
                "counters": {"step": state.step, "g_step": state.g_step,
                             "lambda_step": state.lambda_step,
                             "curriculum_step": state.curriculum_step}}
        with open(path, "rb") as f:
            full = serialization.from_bytes(full, f.read())
        c = full["counters"]
        return state.replace(g_opt_state=full["g_opt_state"],
                             d_opt_state=full["d_opt_state"],
                             step=c["step"], g_step=c["g_step"],
                             lambda_step=c["lambda_step"],
                             curriculum_step=c["curriculum_step"])

    def _load_model(self, state):
        """Return ``state`` with weights restored from ``args.load`` (or the
        experiment's own weights file).  Orbax checkpoint directories
        (``*_weights.orbax``) are auto-detected."""
        from flax import serialization

        path = self.args.load or self.name(*self.weights_ext, self.save_dir)
        if path.endswith(".orbax") or os.path.isdir(path):
            return self._load_orbax(state, os.path.abspath(path))
        if (not os.path.exists(path)
                and getattr(self.args, "ckpt_backend", "msgpack") == "orbax"):
            opath = self._orbax_path()
            if not os.path.isdir(opath) and os.path.isdir(opath + ".old"):
                # crash window of _save_orbax between the two renames:
                # the previous checkpoint survives at `.old` — recover it
                os.rename(opath + ".old", opath)
            if os.path.isdir(opath):
                return self._load_orbax(state, opath)
        from mixstage_tpu.interop.torch_import import sniff_torch_file
        if sniff_torch_file(path):
            # a REFERENCE (pytorch/pycasper) checkpoint: convert its
            # state_dict into our trees so `-load` on any CLI accepts
            # experiments trained with chahuja/mix-stage directly
            from mixstage_tpu.interop.torch_import import (
                convert_reference_checkpoint, load_torch_state_dict)
            sd = load_torch_state_dict(path)
            converted, report = convert_reference_checkpoint(
                sd, self._state_to_ckpt(state))
            print(f"[import] converted {report['n_converted']} tensors from "
                  f"reference torch checkpoint {path} "
                  f"({report['n_skipped']} reference-only keys skipped)")
            if report["surprising_skipped"]:
                print("[import] NOTE unrecognized reference keys skipped: "
                      + ", ".join(report["surprising_skipped"][:8]))
            return state.replace(g_params=converted["g_params"],
                                 g_state=converted["g_state"],
                                 d_params=converted["d_params"],
                                 d_state=converted["d_state"])
        with open(path, "rb") as f:
            ckpt = serialization.msgpack_restore(f.read())
        restored = {}
        template = self._state_to_ckpt(state)
        for key, tmpl in template.items():
            if tmpl is None or ckpt.get(key) in (None, {}):
                restored[key] = tmpl
            else:
                restored[key] = serialization.from_state_dict(tmpl, ckpt[key])
        return state.replace(g_params=restored["g_params"],
                             g_state=restored["g_state"],
                             d_params=restored["d_params"],
                             d_state=restored["d_state"])

    def export_experiment(self, state, out_dir: str) -> str:
        """Write this experiment (args + weights) in OUR native format into
        ``out_dir`` — used by ``cli.import_torch`` after a reference torch
        checkpoint was converted by ``_load_model``.  The exported args drop
        ``load`` so the new experiment stands alone.  Returns the new
        weights path."""
        import copy as _copy

        args = _copy.deepcopy(self.args)
        args.load = None
        args.save_dir = out_dir
        args.save(self.name("args", "args", out_dir))
        with open(self.name("name", "name", out_dir), "w") as f:
            f.write(self.name.prefix)
        path = self.name(*self.weights_ext, out_dir)
        with open(path, "wb") as f:
            f.write(self._serialize(state))
        return path

    # ---------------------------------------------------------------- results
    def update_res(self, res_dict: Dict[str, float]):
        for key, val in res_dict.items():
            self.res.setdefault(key, []).append(float(val))

    def _save_res(self):
        json.dump(self.res, open(self.name("res", "json", self.save_dir), "w"))

    def print_res(self, epoch, key_order, metric_order=(), exp=None, lr=None):
        parts = [f"exp: {exp}", f"epoch: {epoch}"]
        for key in list(key_order):
            if key in self.res and self.res[key]:
                parts.append(f"{key}: {self.res[key][-1]:.6f}")
        for key in metric_order:
            for split in ["train", "dev", "test"]:
                full = f"{split}_{key}"
                if full in self.res and self.res[full]:
                    parts.append(f"{full}: {self.res[full][-1]:.4f}")
        parts.append(f"lr: {lr}")
        self.log("  ".join(str(p) for p in parts))

    def update_tb(self, updates: Dict[str, Any]):
        """Tensorboard scalars (reference trainer.py:533-551); no-op without
        a writer backend."""
        if not self._tb:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:  # tb requested but no backend: warn once, no-op
            if not getattr(self, "_tb_warned", False):
                self._tb_warned = True
                self.log("WARNING: -tb 1 but tensorboard is unavailable; "
                         "scalars will not be written")
            return
        if not hasattr(self, "_writer"):
            self._writer = SummaryWriter(log_dir=self.name.dir(self.save_dir))
        for tag, val, step in updates.get("scalar", []):
            self._writer.add_scalar(tag, float(val), int(step))
        self._writer.flush()

    # ----------------------------------------------------------- early stop
    def stop_training(self, state, epoch) -> bool:
        """Greedy-save + early-stopping policy (pycasper semantics driven by
        dev_key/dev_sign/stop_thresh/eps/greedy_save/overfit/min_epochs —
        reference argsUtils.py:84-97,151-163, invoked trainer.py:564)."""
        key = self.dev_key if self.dev_key in self.res else "dev"
        if key not in self.res or not self.res[key]:
            return False
        score = self.res[key][-1]
        improved = (self.dev_sign * score
                    < self.dev_sign * self.best_dev_score - self.args.eps)
        if self.args.overfit:
            self._save_model(state)
            return False
        if improved:
            self.best_dev_score = score
            self.stop_count = 0
            if self.args.greedy_save:
                self._save_model(state)
        else:
            self.stop_count += 1
        if (self.args.early_stopping and self.stop_count >= self.args.stop_thresh
                and epoch >= self.args.min_epochs):
            self.log(f"early stopping at epoch {epoch} "
                     f"(best {key}: {self.best_dev_score:.6f})")
            return True
        return False
