"""Jitted training step for IR-SDE models.

Replaces the reference's ``DenoisingModel.optimize_parameters``
(ref denoising_model.py:127-148) with a single pure function: sample
per-example timesteps + noisy states, run the score net, form the
maximum-likelihood objective

    loss = w * || reverse_sde_step_mean(x_t, score, t)
                 - reverse_optimum_step(x_t, x_0, t) ||_1,

take grads, apply the optax update and the EMA — all inside one XLA program.
Under a device mesh the same function runs data-parallel via sharding
annotations (see ``parallel.mesh``); XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..sde.denoising_sde import DenoisingSDE
from ..sde.irsde import IRSDE
from . import ema as ema_lib
from .ema import EmaConfig, EmaState
from .losses import matching_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32
    params: Any
    opt_state: Any
    ema: EmaState


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_lib.init(params),
    )


def make_train_step(
    sde: IRSDE,
    model_apply: Callable,  # (params, xt, cond, tvec) -> noise prediction
    tx: optax.GradientTransformation,
    loss_type: str = "l1",
    is_weighted: bool = False,
    weight: float = 1.0,
    ema_cfg: EmaConfig = EmaConfig(),
    remat: bool = False,
) -> Callable:
    """Build the IR-SDE train step.

    Returned signature: ``(state, lq, gt, key) -> (state, metrics)`` with
    NHWC ``lq``/``gt`` and a per-run base PRNG key (folded with the step so
    timestep/noise draws are i.i.d. per iteration).  ``remat=True``
    rematerializes the score-net forward in the backward pass (HBM for
    FLOPs — bigger batches per chip).
    """
    if remat:
        model_apply = jax.checkpoint(model_apply)

    def train_step(
        state: TrainState, lq: jnp.ndarray, gt: jnp.ndarray, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(key, state.step)
        timesteps, xt = sde.generate_random_states(key, gt, lq)
        tvec = timesteps.reshape(-1)

        def loss_fn(params):
            noise = model_apply(params, xt, lq, tvec)
            score = sde.score_from_noise(noise, timesteps)
            pred = sde.reverse_sde_step_mean(xt, lq, score, timesteps)
            target = sde.reverse_optimum_step(xt, gt, lq, timesteps)
            w = sde.weights(tvec) if is_weighted else None
            return weight * matching_loss(pred, target, loss_type, w)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_state = ema_lib.update(state.ema, params, ema_cfg)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema_state
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return train_step


def make_denoising_train_step(
    sde: DenoisingSDE,
    model_apply: Callable,  # (params, x, tvec) -> noise prediction (uncond)
    tx: optax.GradientTransformation,
    loss_type: str = "l1",
    is_weighted: bool = True,
    weight: float = 1.0,
    ema_cfg: EmaConfig = EmaConfig(),
) -> Callable:
    """Train step for the unconditional denoising task.

    Parity: ref config/denoising-sde/models/denoising_model.py:136-160 — the
    network sees the noisy state directly, and the loss is sigma^2-weighted
    by default (``weights = sde.weights(t)``).
    Returned signature: ``(state, gt, key) -> (state, metrics)``.
    """

    def train_step(state: TrainState, gt: jnp.ndarray, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        timesteps, xt = sde.generate_random_states(key, gt)
        tvec = timesteps.reshape(-1)

        def loss_fn(params):
            noise = model_apply(params, xt, tvec)
            score = sde.score_from_noise(noise, timesteps)
            pred = sde.reverse_sde_step_mean(xt, score, timesteps)
            target = sde.reverse_optimum_step(xt, gt, timesteps)
            w = sde.weights(tvec) if is_weighted else None
            return weight * matching_loss(pred, target, loss_type, w)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_state = ema_lib.update(state.ema, params, ema_cfg)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema_state
        )
        return new_state, {"loss": loss}

    return train_step
