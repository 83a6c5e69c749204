"""Exponential moving average of parameters, matching ema_pytorch semantics.

The reference wraps its model in ``ema_pytorch.EMA(model, beta=0.995,
update_every=10)`` (ref denoising_model.py:118) and calls ``.update()`` once
per optimizer step (denoising_model.py:145).  ema_pytorch's behavior with its
defaults (update_after_step=100, inv_gamma=1.0, power=2/3, min_value=0):

- the internal counter increments every call; the EMA only moves when
  ``step % update_every == 0``;
- while ``step <= update_after_step`` the EMA is a plain copy of the params;
- afterwards the decay ramps: ``d = 1 - (1 + epoch/inv_gamma)^(-power)``
  with ``epoch = step - update_after_step - 1``, clamped to
  ``[min_value, beta]`` (and 0 when epoch <= 0);
- ``ema = d * ema + (1-d) * params``.

Implemented as a pure function on an ``EmaState`` pytree so it runs inside
the jitted train step (branchless ``jnp.where`` selects on traced scalars).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmaConfig:
    beta: float = struct.field(pytree_node=False, default=0.995)
    update_every: int = struct.field(pytree_node=False, default=10)
    update_after_step: int = struct.field(pytree_node=False, default=100)
    inv_gamma: float = struct.field(pytree_node=False, default=1.0)
    power: float = struct.field(pytree_node=False, default=2.0 / 3.0)
    min_value: float = struct.field(pytree_node=False, default=0.0)


@struct.dataclass
class EmaState:
    params: Any
    step: jnp.ndarray  # () int32 — counts update() calls


def init(params) -> EmaState:
    # real copies, not aliases — TrainState donation would otherwise donate
    # the same buffer twice (params and ema.params)
    return EmaState(
        params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        step=jnp.zeros((), jnp.int32),
    )


def current_decay(step: jnp.ndarray, cfg: EmaConfig) -> jnp.ndarray:
    epoch = jnp.clip(
        step.astype(jnp.float32) - cfg.update_after_step - 1.0, 0.0, None
    )
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def update(state: EmaState, params, cfg: EmaConfig = EmaConfig()) -> EmaState:
    """One ``EMA.update()`` call (to be invoked once per train step)."""
    step = state.step
    is_update_round = (step % cfg.update_every) == 0
    decay = current_decay(step, cfg)
    # while warming up (or on the first live round), decay=0 -> plain copy
    decay = jnp.where(step <= cfg.update_after_step, 0.0, decay)

    def blend(e, p):
        new = decay * e.astype(jnp.float32) + (1.0 - decay) * p.astype(jnp.float32)
        return new.astype(e.dtype)

    # lax.cond (not a tree-wide where): on the 9/10 non-update rounds the
    # identity branch aliases the EMA buffers instead of re-reading and
    # re-writing the whole parameter-sized tree every step
    new_params = jax.lax.cond(
        is_update_round,
        lambda e: jax.tree.map(blend, e, params),
        lambda e: e,
        state.params,
    )
    return EmaState(params=new_params, step=step + 1)
