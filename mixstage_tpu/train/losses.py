"""Loss registry + GAN loss helpers.

Replaces the reference's ``eval('torch.nn.' + loss)`` criterion dispatch
(``/root/reference/src/model/trainer.py:219``) and the ``GAN`` loss math
(``/root/reference/src/model/gan.py:47-164``).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def mse(y_cap, y):
    return (y_cap - y) ** 2


def l1(y_cap, y):
    return jnp.abs(y_cap - y)


def smooth_l1(y_cap, y, beta: float = 1.0):
    d = jnp.abs(y_cap - y)
    return jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta)


def huber(y_cap, y, delta: float = 1.0):
    """torch ``nn.HuberLoss`` semantics: quadratic below ``delta``, then
    ``delta*(|d| - delta/2)`` — i.e. ``delta * smooth_l1(beta=delta)``,
    NOT smooth_l1 with ``beta`` renamed."""
    d = jnp.abs(y_cap - y)
    return jnp.where(d < delta, 0.5 * d ** 2, delta * (d - 0.5 * delta))


CRITERIA: Dict[str, Callable] = {
    "MSELoss": mse,
    "L1Loss": l1,
    "SmoothL1Loss": smooth_l1,
    "HuberLoss": huber,
}


def get_criterion(name: str, **kwargs) -> Callable:
    """Criterion lookup with torch-style construction kwargs (the reference's
    ``-lossKwargs``, trainer.py:219, e.g. ``{'beta': 0.5}`` for SmoothL1Loss).
    ``reduction`` is dropped: reduction is structural in the step functions
    (per-sample weighting then mean, gan.py:64-67)."""
    if name not in CRITERIA:
        raise KeyError(f"loss {name!r} not in registry; known: {sorted(CRITERIA)}")
    kwargs.pop("reduction", None)
    fn = CRITERIA[name]
    if kwargs:
        from functools import partial
        return partial(fn, **kwargs)
    return fn


def sample_wise_weight_mean(loss, w):
    """Per-sample weighted mean (gan.py:64-67): broadcast w over trailing dims."""
    w = w.reshape((w.shape[0],) + (1,) * (loss.ndim - 1))
    return (w * loss).mean()


def cross_entropy(logits, labels):
    """Mean softmax cross-entropy with integer labels (torch
    ``F.cross_entropy`` semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -picked.mean()


def velocity(x):
    """Pose → velocity with a zero first frame (gan.py:47-52)."""
    v = x[..., 1:, :] - x[..., :-1, :]
    return jnp.concatenate([jnp.zeros_like(x[..., 0:1, :]), v], axis=-2)


def lambda_schedule(step, init_lambda: float, max_lambda: float = 2.0,
                    max_interval: int = 300):
    """GAN loss-weight ramp.

    The reference uses ``pycasper.torchUtils.LambdaScheduler(kind='incremental',
    max_interval=300, max_lambda=2)`` stepped every training forward
    (gan.py:30-33,103).  pycasper is an external dependency whose exact ramp is
    not in the reference repo; we implement the documented intent as a linear
    ramp from the initial weight to ``max_lambda`` over ``max_interval`` steps,
    then hold.
    """
    frac = jnp.clip(step / max_interval, 0.0, 1.0)
    return init_lambda + (max_lambda - init_lambda) * frac


def adaptive_d_prob(d_prob: float, W, dg_iter_ratio: float = 1.0,
                    ema: float = 0.9, lo: float = 0.05,
                    hi: float = 0.95) -> float:
    """Adapt the host-side D/G coin probability from the weighted-GAN sample
    weights (``-update_D_prob_flag``).

    The reference declares this feedback hook (``gan.py:44,97-98`` calls
    ``self.update_D_prob(W)``) but its base implementation is a stub
    (gan.py:83-84); we implement the documented intent: W = 1/p_real, so a
    high mean W means the discriminator is unconvinced by *real* samples —
    it is weak and should train more often.  The effective iteration ratio
    becomes ``r·mean(W)`` and the new coin probability ``r'/(r'+1)``,
    EMA-smoothed and clipped so neither player is starved.  Host-side float
    math — never traced (replica-consistent by construction).
    """
    import numpy as np

    w_mean = float(np.mean(np.asarray(W, np.float64)))
    if not np.isfinite(w_mean) or w_mean <= 0:
        return d_prob
    r_eff = dg_iter_ratio * w_mean
    target = r_eff / (r_eff + 1.0)
    return float(np.clip(ema * d_prob + (1.0 - ema) * target, lo, hi))
