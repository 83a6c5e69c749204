"""Theta schedules and precomputed SDE coefficient tables.

Reference parity: ``codes/utils/sde_utils.py:89-152`` (IRSDE._initialize) and
``codes/utils/sde_utils.py:382-426`` (DenoisingSDE._initialize).

The reference keeps the tables as device tensors indexed by python-int
timesteps inside python loops.  Here the tables are a frozen pytree
(:class:`ScheduleTables`) built once on host in float64 and stored float32;
all SDE math is then pure functions of the tables, so samplers compile to a
single fused XLA program (one ``lax.scan``) instead of T dispatches.

Timestep convention (identical to the reference): ``t`` runs 1..T and all
tables have ``T+1`` entries so timestep values index directly;
``thetas_cumsum[0] == 0`` and entry 0 of ``sigma_bars`` is 0 ("state 0 is
never used").
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def constant_theta_schedule(T: int, v: float = 1.0) -> np.ndarray:
    """theta_t = v for t in 0..T.  Ref: sde_utils.py:91-97."""
    return np.full(T + 1, v, dtype=np.float64)


def linear_theta_schedule(T: int) -> np.ndarray:
    """DDPM-style linear beta range rescaled by 1000/(T+1).

    Ref: sde_utils.py:99-108.
    """
    n = T + 1
    scale = 1000.0 / n
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, n, dtype=np.float64)


def cosine_theta_schedule(T: int, s: float = 0.008) -> np.ndarray:
    """Nichol–Dhariwal cosine schedule, truncated to T+1 entries.

    Ref: sde_utils.py:110-121 — note the reference uses
    ``betas = 1 - alphas_cumprod[1:-1]`` (cumulative, not ratio form).
    """
    n = T + 2
    steps = n + 1
    x = np.linspace(0, n, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / n) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - alphas_cumprod[1:-1]
    return betas


_SCHEDULES = {
    "constant": constant_theta_schedule,
    "linear": linear_theta_schedule,
    "cosine": cosine_theta_schedule,
}


def make_theta_schedule(name: str, T: int) -> np.ndarray:
    try:
        return _SCHEDULES[name](T)
    except KeyError:
        raise ValueError(
            f"unknown theta schedule {name!r}; available: {sorted(_SCHEDULES)}"
        ) from None


@struct.dataclass
class ScheduleTables:
    """Frozen pytree of precomputed SDE coefficients.

    Mirrors the state IRSDE._initialize leaves behind
    (ref sde_utils.py:141-152): per-step thetas/sigmas, shifted cumulative
    thetas, marginal stds ``sigma_bars``, the eps-recomputed ``dt`` and the
    normalized ``max_sigma``.  ``T`` is static (python int) so it can shape
    scan lengths.
    """

    thetas: jnp.ndarray  # (T+1,) f32
    sigmas: jnp.ndarray  # (T+1,) f32, sqrt(2 theta max_sigma^2)
    thetas_cumsum: jnp.ndarray  # (T+1,) f32, cumsum shifted so [0] == 0
    sigma_bars: jnp.ndarray  # (T+1,) f32, marginal std at t
    dt: jnp.ndarray  # () f32
    max_sigma: jnp.ndarray  # () f32 (already /255-normalized)
    T: int = struct.field(pytree_node=False)


def build_tables(
    max_sigma: float,
    T: int,
    schedule: str = "cosine",
    eps: float = 0.01,
) -> ScheduleTables:
    """Build :class:`ScheduleTables` with reference-parity math.

    ``max_sigma`` >= 1 is interpreted as 0..255-scale and divided by 255
    (ref sde_utils.py:86).  ``dt`` is recomputed from eps so the terminal
    marginal std approaches ``max_sigma * sqrt(1 - eps^2)``
    (ref sde_utils.py:143).
    """
    max_sigma = max_sigma / 255.0 if max_sigma >= 1 else float(max_sigma)
    thetas = make_theta_schedule(schedule, T)
    sigmas = np.sqrt(max_sigma**2 * 2.0 * thetas)
    thetas_cumsum = np.cumsum(thetas) - thetas[0]  # thetas[0] is not 0
    dt = -1.0 / thetas_cumsum[-1] * math.log(eps)
    sigma_bars = np.sqrt(max_sigma**2 * (1.0 - np.exp(-2.0 * thetas_cumsum * dt)))

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return ScheduleTables(
        thetas=f32(thetas),
        sigmas=f32(sigmas),
        thetas_cumsum=f32(thetas_cumsum),
        sigma_bars=f32(sigma_bars),
        dt=f32(dt),
        max_sigma=f32(max_sigma),
        T=int(T),
    )
