"""Denoising SDE variant: the marginal mean is x0 itself.

Pure-functional JAX port of the reference ``DenoisingSDE``
(``codes/utils/sde_utils.py:373-593``), used by the ``denoising-sde`` task:
unconditional score model ``model(x, t)``, sigma^2-weighted loss, and the
ability to start the reverse chain at the timestep matching a given noise
level (``optimal_timestep``).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .schedules import ScheduleTables, make_theta_schedule


@struct.dataclass
class DenoisingSDE:
    """Frozen pytree for the pure-denoising mean-reverting SDE."""

    tables: ScheduleTables

    @classmethod
    def create(
        cls,
        max_sigma: float,
        T: int,
        schedule: str = "cosine",
        eps: float = 0.04,
    ) -> "DenoisingSDE":
        """Ref: sde_utils.py:377-429.

        Notes vs IRSDE: normalization uses strict ``> 1`` (sde_utils.py:379),
        eps defaults to 0.04 (sde_utils.py:382), and any non-cosine schedule
        name falls back to linear (sde_utils.py:414-417).
        """
        max_sigma = max_sigma / 255.0 if max_sigma > 1 else float(max_sigma)
        if schedule != "cosine":
            schedule = "linear"
        thetas = make_theta_schedule(schedule, T)
        sigmas = np.sqrt(max_sigma**2 * 2.0 * thetas)
        thetas_cumsum = np.cumsum(thetas) - thetas[0]
        dt = -1.0 / thetas_cumsum[-1] * math.log(eps)
        sigma_bars = np.sqrt(max_sigma**2 * (1.0 - np.exp(-2.0 * thetas_cumsum * dt)))
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            tables=ScheduleTables(
                thetas=f32(thetas),
                sigmas=f32(sigmas),
                thetas_cumsum=f32(thetas_cumsum),
                sigma_bars=f32(sigma_bars),
                dt=f32(dt),
                max_sigma=f32(max_sigma),
                T=int(T),
            )
        )

    # ------------------------------------------------------------- shortcuts
    @property
    def T(self) -> int:
        return self.tables.T

    @property
    def dt(self) -> jnp.ndarray:
        return self.tables.dt

    @property
    def max_sigma(self) -> jnp.ndarray:
        return self.tables.max_sigma

    def theta(self, t):
        return self.tables.thetas[t]

    def sigma(self, t):
        return self.tables.sigmas[t]

    def theta_cumsum(self, t):
        return self.tables.thetas_cumsum[t]

    def sigma_bar(self, t):
        return self.tables.sigma_bars[t]

    # ------------------------------------------------------------------ math
    def mu_bar(self, x0, t):
        """The denoising SDE's marginal mean is x0.  Ref: sde_utils.py:441-442."""
        return x0

    def drift(self, x, x0, t):
        """Ref: sde_utils.py:447-448."""
        return self.theta(t) * (x0 - x) * self.dt

    def dispersion(self, noise, t):
        """Ref: sde_utils.py:458-459."""
        return self.sigma(t) * jnp.sqrt(self.dt) * noise

    def sde_reverse_drift(self, score, t):
        """-(1/2) sigma_t^2 (1 + e^{-2 theta_cumsum_t dt}) score dt.

        Ref: sde_utils.py:450-452.
        """
        A = jnp.exp(-2 * self.theta_cumsum(t) * self.dt)
        return -0.5 * self.sigma(t) ** 2 * (1 + A) * score * self.dt

    def ode_reverse_drift(self, score, t):
        """Ref: sde_utils.py:454-456."""
        A = jnp.exp(-2 * self.theta_cumsum(t) * self.dt)
        return -0.5 * self.sigma(t) ** 2 * A * score * self.dt

    def reverse_sde_step(self, x, score, t, noise):
        return x - self.sde_reverse_drift(score, t) - self.dispersion(noise, t)

    def reverse_sde_step_mean(self, x, score, t):
        return x - self.sde_reverse_drift(score, t)

    def reverse_ode_step(self, x, score, t):
        return x - self.ode_reverse_drift(score, t)

    # --------------------------------------------------------- score algebra
    def score_from_noise(self, noise, t):
        return -noise / self.sigma_bar(t)

    def get_init_state_from_noise(self, x, noise, t):
        """Ref: sde_utils.py:464-465."""
        return x - self.sigma_bar(t) * noise

    def get_init_state_from_score(self, x, score, t):
        """Ref: sde_utils.py:467-468."""
        return x + self.sigma_bar(t) ** 2 * score

    def get_real_noise(self, xt, x0, t):
        return (xt - x0) / self.sigma_bar(t)

    def get_real_score(self, xt, x0, t):
        return -(xt - x0) / self.sigma_bar(t) ** 2

    def reverse_optimum_step(self, xt, x0, t):
        """Ref: sde_utils.py:561-569 (term2 collapses: mean reverts to x0)."""
        A = jnp.exp(-self.theta(t) * self.dt)
        B = jnp.exp(-self.theta_cumsum(t) * self.dt)
        C = jnp.exp(-self.theta_cumsum(t - 1) * self.dt)
        term1 = A * (1 - C**2) / (1 - B**2)
        return term1 * (xt - x0) + x0

    def get_optimal_timestep(self, sigma: float, eps: float = 1e-6) -> jnp.ndarray:
        """Map a noise std to the closest schedule timestep, to start the
        reverse chain mid-way.  Ref: sde_utils.py:550-554.
        """
        sigma = sigma / 255.0 if sigma > 1 else sigma
        thetas_cumsum_hat = (
            -1.0
            / (2 * self.dt)
            * jnp.log(1 - sigma**2 / self.max_sigma**2 + eps)
        )
        return jnp.argmin(jnp.abs(self.tables.thetas_cumsum - thetas_cumsum_hat))

    # ------------------------------------------------------------- training
    def weights(self, t):
        """sigma_t^2 loss weights.  Ref: sde_utils.py:579-581."""
        return self.sigma(t) ** 2

    def generate_random_states(
        self, key: jax.Array, x0: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ref: sde_utils.py:583-593."""
        batch = x0.shape[0]
        kt, kn = jax.random.split(key)
        timesteps = jax.random.randint(
            kt, (batch, 1, 1, 1), minval=1, maxval=self.T + 1, dtype=jnp.int32
        )
        noises = jax.random.normal(kn, x0.shape, dtype=jnp.float32)
        noisy_states = noises * self.sigma_bar(timesteps) + x0
        return timesteps, noisy_states
