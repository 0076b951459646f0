"""Explicit train-state pytrees + optimizer/schedule construction.

Replaces the reference's stateful trainer attributes (G/D optimizers,
schedulers, lambda scheduler, curriculum counters —
``/root/reference/src/model/trainer.py:151-157``, ``gan.py:27-34``,
``joint_late_cluster_soft_style.py:94``) with a single flax.struct dataclass
that jit/pjit can thread, donate and checkpoint.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    # generator side (for style models g_params/g_state contain both the
    # generator and the pose-style encoder subtrees)
    g_params: Any
    g_state: Any          # batch_stats collection
    g_opt_state: Any
    # discriminator side (None when gan == 0)
    d_params: Any = None
    d_state: Any = None
    d_opt_state: Any = None
    # counters
    step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    g_step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    lambda_step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    curriculum_step: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
}


def translate_optim_kwargs(kwargs: dict) -> dict:
    """torch optimizer kwargs (the reference's ``-optimKwargs``,
    trainer.py:278-283) → optax names: betas=(b1,b2) → b1/b2; momentum and
    eps/weight_decay pass through."""
    out = dict(kwargs)
    if "betas" in out:
        b1, b2 = out.pop("betas")
        out.update(b1=b1, b2=b2)
    return out


def make_optimizer(name: str, lr: float, grad_clip: Optional[float] = None,
                   schedule=None, text_lr: Optional[float] = None, **kwargs
                   ) -> optax.GradientTransformation:
    """Optimizer with optional global-norm clip (reference clips G/D grads to 1,
    trainer.py:1138-1146), an optional per-*step* schedule, and an optional
    separate learning rate for the text-encoder subtree (the reference's
    -optim_separate for bert, trainer.py:268-278)."""
    if name not in OPTIMIZERS:
        raise KeyError(f"optimizer {name!r} unknown; known: {sorted(OPTIMIZERS)}")
    lr_or_schedule = schedule if schedule is not None else lr

    def base(rate):
        return OPTIMIZERS[name](learning_rate=rate, **kwargs)

    if text_lr is not None:
        def label_fn(params):
            def walk(tree, in_text):
                if isinstance(tree, dict):
                    return {k: walk(v, in_text or k == "text_encoder")
                            for k, v in tree.items()}
                return "text" if in_text else "rest"
            return walk(params, False)
        tx = optax.multi_transform({"text": base(text_lr),
                                    "rest": base(lr_or_schedule)}, label_fn)
    else:
        tx = base(lr_or_schedule)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    return optax.chain(*chain)


def make_schedule(kind: Optional[str], lr: float, gamma: float,
                  warmup_steps: int, total_steps: int,
                  steps_per_epoch: int):
    """Learning-rate schedules with reference semantics:

    * default: ExponentialLR stepped per *epoch* (trainer.py:311-313) →
      lr * gamma^epoch, expressed per-step via steps_per_epoch;
    * 'linear_decay': linear warmup then linear decay per *step*
      (trainer.py:292-309).
    """
    if kind == "linear_decay":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = step / jnp.maximum(warmup_steps, 1)
            decay = jnp.maximum(
                0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1))
            return lr * jnp.where(step < warmup_steps, warm, decay)
        return sched

    def sched(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32)
                          / jnp.maximum(steps_per_epoch, 1))
        return lr * (gamma ** epoch)
    return sched


def tree_size(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
