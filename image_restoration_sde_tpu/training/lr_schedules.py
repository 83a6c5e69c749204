"""Learning-rate schedules as pure ``step -> lr`` functions (optax-style).

Parity targets:

- ``MultiStepLR_Restart``  (ref models/lr_scheduler.py:8-44).  NOTE the
  reference's ``get_lr`` multiplies by a hardcoded ``gamma_ = 0.5`` and
  ignores the ctor gamma (lr_scheduler.py:21,42) — with the shipped configs
  (``lr_gamma: 0.5``) the *effective* decay is 0.5, which is what we
  reproduce; the ``gamma`` argument here is actually honored.
- ``CosineAnnealingLR_Restart`` (ref lr_scheduler.py:47-91).
- torch ``CosineAnnealingLR`` ("TrueCosineAnnealingLR" in the YAML,
  ref denoising_model.py:107-114).
- Linear warmup override (ref base_model.py:52-64): for
  ``step < warmup_iter`` the LR is ``init_lr * step / warmup_iter``,
  *overriding* the scheduler output.

Schedules are evaluated inside the jitted train step, so they use jnp ops on
a traced step counter.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def multistep_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.5,
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Optional[Sequence[float]] = None,
) -> Schedule:
    """Step decay by ``gamma`` at each milestone, with optional restarts that
    reset the LR to ``base_lr * weight`` and forget prior decays."""
    milestones = np.asarray(sorted(milestones), dtype=np.int64)
    restarts_list = list(restarts or [])
    weights_list = list(restart_weights or [1.0] * len(restarts_list))
    if len(restarts_list) != len(weights_list):
        raise ValueError("restarts and their weights do not match")
    if 0 not in restarts_list:
        restarts_list = [0] + restarts_list
        weights_list = [1.0] + weights_list
    order = np.argsort(restarts_list)
    weights_arr = np.asarray(weights_list, dtype=np.float32)[order]

    ms = jnp.asarray(milestones)
    rs = jnp.asarray(np.asarray(restarts_list, dtype=np.int64)[order])
    ws = jnp.asarray(weights_arr)

    def schedule(step):
        step = jnp.asarray(step)
        # last restart at or before step
        ridx = jnp.clip(jnp.searchsorted(rs, step, side="right") - 1, 0, len(weights_arr) - 1)
        last_restart = rs[ridx]
        weight = ws[ridx]
        # milestones passed since the restart (milestone counts when step >= m)
        n_decays = jnp.sum((ms > last_restart) & (ms <= step))
        return base_lr * weight * gamma ** n_decays.astype(jnp.float32)

    return schedule


def cosine_annealing_restart(
    base_lr: float,
    t_periods: Sequence[int],
    eta_min: float = 0.0,
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Optional[Sequence[float]] = None,
) -> Schedule:
    """Per-period cosine annealing with restart weights.

    Closed form of the reference's recursive scheduler
    (lr_scheduler.py:47-91): within period k starting at restart R_k with
    length T_k, lr = eta_min + (base*w_k - eta_min) * (1+cos(pi (s-R_k)/T_k))/2.
    """
    restarts = list(restarts or [])
    starts = np.asarray([0] + restarts, dtype=np.int64)
    periods = np.asarray(t_periods, dtype=np.float32)
    weights_arr = np.asarray([1.0] + list(restart_weights or [1.0] * len(restarts)), dtype=np.float32)
    if not (len(starts) == len(periods) == len(weights_arr)):
        raise ValueError("t_periods / restarts / weights lengths mismatch")

    st = jnp.asarray(starts)
    pd = jnp.asarray(periods)
    ws = jnp.asarray(weights_arr)

    def schedule(step):
        step = jnp.asarray(step)
        k = jnp.clip(jnp.searchsorted(st, step, side="right") - 1, 0, len(periods) - 1)
        frac = (step - st[k]).astype(jnp.float32) / pd[k]
        return eta_min + (base_lr * ws[k] - eta_min) * (1 + jnp.cos(jnp.pi * frac)) / 2

    return schedule


def true_cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0) -> Schedule:
    """torch CosineAnnealingLR closed form (the Refusion configs' scheduler)."""

    def schedule(step):
        frac = jnp.asarray(step, jnp.float32) / float(t_max)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * frac)) / 2

    return schedule


def with_warmup(schedule: Schedule, base_lr: float, warmup_iter: int) -> Schedule:
    """Linear warmup override for the first ``warmup_iter`` steps.

    Matches BaseModel.update_learning_rate (base_model.py:52-64): warmup
    scales the *initial* LR, not the scheduler output.
    """
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        step = jnp.asarray(step)
        warm = base_lr * step.astype(jnp.float32) / float(warmup_iter)
        return jnp.where(step < warmup_iter, warm, schedule(step))

    return warmed


def build_lr_schedule(train_opt: dict) -> Schedule:
    """Build the schedule from a reference-format ``train:`` options dict.

    YAML surface: lr_scheme (MultiStepLR | TrueCosineAnnealingLR |
    CosineAnnealingLR_Restart), lr_G, lr_steps, lr_gamma, restarts,
    restart_weights, niter, eta_min, warmup_iter, T_period.
    Ref: denoising_model.py:94-116.
    """
    base_lr = float(train_opt["lr_G"])
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    if scheme == "MultiStepLR":
        sched = multistep_restart(
            base_lr,
            train_opt.get("lr_steps") or [],
            gamma=float(train_opt.get("lr_gamma") or 0.5),
            restarts=train_opt.get("restarts"),
            restart_weights=train_opt.get("restart_weights"),
        )
    elif scheme == "TrueCosineAnnealingLR":
        sched = true_cosine_annealing(
            base_lr, int(train_opt["niter"]), float(train_opt.get("eta_min") or 0.0)
        )
    elif scheme == "CosineAnnealingLR_Restart":
        sched = cosine_annealing_restart(
            base_lr,
            train_opt["T_period"],
            eta_min=float(train_opt.get("eta_min") or 0.0),
            restarts=train_opt.get("restarts"),
            restart_weights=train_opt.get("restart_weights"),
        )
    else:
        raise NotImplementedError(f"lr_scheme {scheme!r}")
    warmup = train_opt.get("warmup_iter") or -1
    return with_warmup(sched, base_lr, int(warmup))
