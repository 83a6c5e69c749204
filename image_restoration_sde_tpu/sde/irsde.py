"""Mean-reverting IR-SDE:  dx = theta_t (mu - x) dt + sigma_t dW.

Pure-functional JAX port of the reference ``IRSDE``
(``codes/utils/sde_utils.py:80-361``).  Differences by design:

- No mutable ``set_mu`` / ``set_model`` state: the terminal mean ``mu`` (the
  LQ image) and the score network are explicit arguments, so every method is
  a pure function and jit/vmap/scan-compatible.
- Randomness is explicit: methods that draw noise take the noise (or a PRNG
  key) as an argument instead of sampling from a hidden global RNG.
- Timesteps ``t`` are int32 arrays of any broadcastable shape (scalar at
  sampling time, ``(B,1,1,1)`` at training time); coefficient lookups are
  gathers on the precomputed tables.

Images are NHWC float32 throughout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .schedules import ScheduleTables, build_tables


@struct.dataclass
class IRSDE:
    """Frozen pytree of IR-SDE coefficients with pure math methods.

    Timesteps run 1..T (state 0 never used), matching the reference
    convention (sde_utils.py:81-83).
    """

    tables: ScheduleTables

    # ------------------------------------------------------------------ ctor
    @classmethod
    def create(
        cls,
        max_sigma: float,
        T: int = 100,
        schedule: str = "cosine",
        eps: float = 0.01,
    ) -> "IRSDE":
        return cls(tables=build_tables(max_sigma, T, schedule, eps))

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
        """Marginal std of x_t given x_0.  Ref: sde_utils.py:169-170."""
        return self.tables.sigma_bars[t]

    # --------------------------------------------------------- forward math
    def mu_bar(self, x0, mu, t):
        """Marginal mean of x_t: mu + (x0-mu) e^{-theta_cumsum_t dt}.

        Ref: sde_utils.py:166-167.
        """
        return mu + (x0 - mu) * jnp.exp(-self.theta_cumsum(t) * self.dt)

    def drift(self, x, mu, t):
        """Forward drift theta_t (mu - x) dt.  Ref: sde_utils.py:172-173."""
        return self.theta(t) * (mu - x) * self.dt

    def dispersion(self, noise, t):
        """sigma_t sqrt(dt) * noise.  Ref: sde_utils.py:181-182."""
        return self.sigma(t) * jnp.sqrt(self.dt) * noise

    def forward_step(self, x, mu, t, noise):
        """Euler–Maruyama forward step.  Ref: sde_utils.py:38-39."""
        return x + self.drift(x, mu, t) + self.dispersion(noise, t)

    # --------------------------------------------------------- score algebra
    def score_from_noise(self, noise, t):
        """score = -noise / sigma_bar_t.  Ref: sde_utils.py:184-185."""
        return -noise / self.sigma_bar(t)

    def get_real_noise(self, xt, x0, mu, t):
        """Ref: sde_utils.py:231-232."""
        return (xt - self.mu_bar(x0, mu, t)) / self.sigma_bar(t)

    def get_real_score(self, xt, x0, mu, t):
        """Ref: sde_utils.py:234-235."""
        return -(xt - self.mu_bar(x0, mu, t)) / self.sigma_bar(t) ** 2

    def get_init_state_from_noise(self, xt, mu, noise, t):
        """Estimate x0 from a noise prediction.  Ref: sde_utils.py:237-239."""
        A = jnp.exp(self.theta_cumsum(t) * self.dt)
        return (xt - mu - self.sigma_bar(t) * noise) * A + mu

    # --------------------------------------------------------- reverse steps
    def sde_reverse_drift(self, x, mu, score, t):
        """Ref: sde_utils.py:175-176."""
        return (self.theta(t) * (mu - x) - self.sigma(t) ** 2 * score) * self.dt

    def ode_reverse_drift(self, x, mu, score, t):
        """Probability-flow ODE drift (0.5 sigma^2).  Ref: sde_utils.py:178-179."""
        return (self.theta(t) * (mu - x) - 0.5 * self.sigma(t) ** 2 * score) * self.dt

    def reverse_sde_step_mean(self, x, mu, score, t):
        """Posterior-mean estimate used as the training prediction.

        Ref: sde_utils.py:41-42.
        """
        return x - self.sde_reverse_drift(x, mu, score, t)

    def reverse_sde_step(self, x, mu, score, t, noise):
        """Ref: sde_utils.py:44-45."""
        return x - self.sde_reverse_drift(x, mu, score, t) - self.dispersion(noise, t)

    def reverse_ode_step(self, x, mu, score, t):
        """Ref: sde_utils.py:47-48."""
        return x - self.ode_reverse_drift(x, mu, score, t)

    def reverse_optimum_step(self, xt, x0, mu, t):
        """Closed-form posterior mean of x_{t-1} | (x_t, x_0).

        Ref: sde_utils.py:196-205.
        """
        A = jnp.exp(-self.theta(t) * self.dt)
        B = jnp.exp(-self.theta_cumsum(t) * self.dt)
        C = jnp.exp(-self.theta_cumsum(t - 1) * self.dt)
        term1 = A * (1 - C**2) / (1 - B**2)
        term2 = C * (1 - A**2) / (1 - B**2)
        return term1 * (xt - mu) + term2 * (x0 - mu) + mu

    def reverse_optimum_std(self, t):
        """Posterior std with log-clamped variance.  Ref: sde_utils.py:207-217."""
        A = jnp.exp(-2 * self.theta(t) * self.dt)
        B = jnp.exp(-2 * self.theta_cumsum(t) * self.dt)
        C = jnp.exp(-2 * self.theta_cumsum(t - 1) * self.dt)
        posterior_var = (1 - A) * (1 - C) / (1 - B)
        min_value = 1e-20 * self.dt
        log_var = jnp.log(jnp.clip(posterior_var, min=min_value))
        return jnp.exp(0.5 * log_var) * self.max_sigma

    def reverse_posterior_step(self, xt, mu, noise_pred, t, noise):
        """DDPM-style ancestral step (2024 posterior-sampling update).

        Ref: sde_utils.py:219-223.
        """
        x0 = self.get_init_state_from_noise(xt, mu, noise_pred, t)
        mean = self.reverse_optimum_step(xt, x0, mu, t)
        std = self.reverse_optimum_std(t)
        return mean + std * noise

    # ------------------------------------------------------------- training
    def weights(self, t):
        """Per-timestep loss weights (opt-in).  Ref: sde_utils.py:339-340."""
        return jnp.exp(-self.theta_cumsum(t) * self.dt)

    def generate_random_states(
        self, key: jax.Array, x0: jnp.ndarray, mu: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample per-example t ~ U{1..T} and the matching noisy state x_t.

        Returns ``(timesteps (B,1,1,1) int32, noisy_states NHWC f32)``.
        Ref: sde_utils.py:342-358.
        """
        batch = x0.shape[0]
        kt, kn = jax.random.split(key)
        timesteps = jax.random.randint(
            kt, (batch, 1, 1, 1), minval=1, maxval=self.T + 1, dtype=jnp.int32
        )
        state_mean = self.mu_bar(x0, mu, timesteps)
        noises = jax.random.normal(kn, state_mean.shape, dtype=jnp.float32)
        noisy_states = noises * self.sigma_bar(timesteps) + state_mean
        return timesteps, noisy_states.astype(jnp.float32)

    def noise_state(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """Test-time init: x + max_sigma * eps.  Ref: sde_utils.py:360-361.

        ``key`` may be a per-sample key batch (sde.rng.is_key_batch): eps
        for sample i then depends only on key i (reproducible serving)."""
        from .rng import normal_like

        return x + normal_like(key, x) * self.max_sigma
