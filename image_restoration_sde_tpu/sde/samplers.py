"""Sampling loops compiled to single XLA programs with ``jax.lax.scan``.

The reference runs its samplers as python loops with one network dispatch per
step (``codes/utils/sde_utils.py:242-299, 483-522``).  On TPU that costs a
host round-trip per step; here each sampler is one ``lax.scan`` over the
descending timestep vector, so the whole 100-step reverse diffusion is a
single fused XLA computation with the LQ conditioning ``mu`` held resident
as a loop-invariant operand.

All samplers take an explicit ``noise_fn`` (the score network predicts noise;
``score = -noise / sigma_bar``):

- IR-SDE samplers:       ``noise_fn(x, mu, tvec) -> noise``  (conditional)
- Denoising samplers:    ``noise_fn(x, tvec) -> noise``      (unconditional)

``tvec`` is an int32 ``(B,)`` vector (the reference passes a python int; a
vector keeps the same network code path for per-sample training timesteps).

Set ``return_all=True`` to also get the full state trajectory (used by the
interpolation demo and debug state dumps — ref sde_utils.py:259-264).

The stochastic samplers accept an optional pre-drawn ``noise_seq`` of shape
``(T, *x.shape)`` (consumed t=T first) instead of a PRNG key.  This exists
for chain-level parity testing against the reference's torch loops — the
same noise draws can be threaded through both implementations
(tests/test_chain_parity.py) — and for externally-reproducible sampling.
The key-driven path's RNG stream is unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .denoising_sde import DenoisingSDE
from .irsde import IRSDE
from .rng import is_key_batch, normal_like, split_key  # noqa: F401 (re-export)

Array = jnp.ndarray
CondNoiseFn = Callable[[Array, Array, Array], Array]
UncondNoiseFn = Callable[[Array, Array], Array]


def _tvec(batch: int, t: Array) -> Array:
    return jnp.full((batch,), t, dtype=jnp.int32)


def _ts_desc(T: int) -> Array:
    return jnp.arange(T, 0, -1, dtype=jnp.int32)


def _maybe_all(x, states, return_all):
    return (x, states) if return_all else x


def _scan_with_noise(step, x0, ts, key, noise_seq, return_all):
    """Scan ``step(x, t, z) -> x`` over ``ts``, drawing ``z`` either from the
    pre-drawn ``noise_seq`` stack (parity/reproducibility path) or from the
    split-per-step PRNG ``key`` (production path, stream unchanged).

    ``key`` may be a per-sample key batch (``is_key_batch``): each sample
    then carries its own split-per-step stream, so its noise draws are
    independent of the rest of the batch."""
    if noise_seq is not None:
        def body(x, tz):
            t, z = tz
            x = step(x, t, z)
            return x, (x if return_all else None)

        return jax.lax.scan(body, x0, (ts, noise_seq))

    def body(carry, t):
        x, key = carry
        key, k = split_key(key)
        z = normal_like(k, x)
        x = step(x, t, z)
        return (x, key), (x if return_all else None)

    (x, _), states = jax.lax.scan(body, (x0, key), ts)
    return x, states


# --------------------------------------------------------------------- IRSDE


def forward_sde(
    sde: IRSDE,
    x0: Array,
    mu: Array,
    key: Optional[jax.Array] = None,
    steps: Optional[int] = None,
    return_all: bool = False,
    noise_seq: Optional[Array] = None,
):
    """Run the forward mean-reverting SDE x0 -> xT (no network).

    Powers the image-interpolation demo (ref demos/interpolation.py:9-11,
    sde_utils.py:242-250).
    """
    T = sde.T if steps is None else steps
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)

    def step(x, t, z):
        return sde.forward_step(x, mu, t, z)

    x, states = _scan_with_noise(step, x0, ts, key, noise_seq, return_all)
    return _maybe_all(x, states, return_all)


def reverse_sde(
    sde: IRSDE,
    noise_fn: CondNoiseFn,
    xt: Array,
    mu: Array,
    key: Optional[jax.Array] = None,
    steps: Optional[int] = None,
    return_all: bool = False,
    noise_seq: Optional[Array] = None,
):
    """Euler–Maruyama reverse SDE, one net call per step.

    Ref: sde_utils.py:252-266.
    """
    T = sde.T if steps is None else steps
    batch = xt.shape[0]

    def step(x, t, z):
        noise_pred = noise_fn(x, mu, _tvec(batch, t))
        score = sde.score_from_noise(noise_pred, t)
        return sde.reverse_sde_step(x, mu, score, t, z)

    x, states = _scan_with_noise(step, xt, _ts_desc(T), key, noise_seq, return_all)
    return _maybe_all(x, states, return_all)


def reverse_ode(
    sde: IRSDE,
    noise_fn: CondNoiseFn,
    xt: Array,
    mu: Array,
    steps: Optional[int] = None,
    return_all: bool = False,
):
    """Deterministic probability-flow ODE sampler.  Ref: sde_utils.py:268-282."""
    T = sde.T if steps is None else steps
    batch = xt.shape[0]

    def body(x, t):
        noise_pred = noise_fn(x, mu, _tvec(batch, t))
        score = sde.score_from_noise(noise_pred, t)
        x = sde.reverse_ode_step(x, mu, score, t)
        return x, (x if return_all else None)

    x, states = jax.lax.scan(body, xt, _ts_desc(T))
    return _maybe_all(x, states, return_all)


def reverse_posterior(
    sde: IRSDE,
    noise_fn: CondNoiseFn,
    xt: Array,
    mu: Array,
    key: Optional[jax.Array] = None,
    steps: Optional[int] = None,
    return_all: bool = False,
    noise_seq: Optional[Array] = None,
):
    """DDPM-style ancestral sampler (2024 update).  Ref: sde_utils.py:284-299."""
    T = sde.T if steps is None else steps
    batch = xt.shape[0]

    def step(x, t, z):
        noise_pred = noise_fn(x, mu, _tvec(batch, t))
        return sde.reverse_posterior_step(x, mu, noise_pred, t, z)

    x, states = _scan_with_noise(step, xt, _ts_desc(T), key, noise_seq, return_all)
    return _maybe_all(x, states, return_all)


def optimal_reverse(
    sde: IRSDE,
    xt: Array,
    x0: Array,
    mu: Array,
    steps: Optional[int] = None,
    return_all: bool = False,
):
    """Ground-truth posterior-mean rollout (no network).  Ref: sde_utils.py:329-335."""
    T = sde.T if steps is None else steps

    def body(x, t):
        x = sde.reverse_optimum_step(x, x0, mu, t)
        return x, (x if return_all else None)

    x, states = jax.lax.scan(body, xt, _ts_desc(T))
    return _maybe_all(x, states, return_all)


def ode_sampler(
    sde: IRSDE,
    noise_fn: CondNoiseFn,
    xt: Array,
    mu: Array,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    method: str = "RK45",
    eps: float = 1e-3,
):
    """Black-box scipy RK45 over the probability-flow ODE (host loop).

    Parity with the reference's unused ``ode_sampler``
    (sde_utils.py:302-327); the drift evaluation is jitted per call but the
    solver runs on host with data-dependent step control, so this is a debug
    tool, not a production path.
    """
    import numpy as np
    from scipy import integrate

    shape = xt.shape
    batch = shape[0]

    @jax.jit
    def drift_eval(x, t):
        noise_pred = noise_fn(x, mu, _tvec(batch, t))
        score = sde.score_from_noise(noise_pred, t)
        return sde.ode_reverse_drift(x, mu, score, t)

    def ode_func(t, x_flat):
        t = jnp.int32(int(t))
        x = jnp.asarray(x_flat.reshape(shape), dtype=jnp.float32)
        return np.asarray(drift_eval(x, t)).reshape(-1)

    solution = integrate.solve_ivp(
        ode_func,
        (sde.T, eps),
        np.asarray(xt).reshape(-1).astype(np.float64),
        rtol=rtol,
        atol=atol,
        method=method,
    )
    return jnp.asarray(solution.y[:, -1].reshape(shape), dtype=jnp.float32)


# ------------------------------------------------------------- DenoisingSDE


def dsde_reverse_sde(
    sde: DenoisingSDE,
    noise_fn: Optional[UncondNoiseFn],
    xt: Array,
    key: Optional[jax.Array] = None,
    x0: Optional[Array] = None,
    steps: Optional[int] = None,
    return_all: bool = False,
    noise_seq: Optional[Array] = None,
):
    """Reverse SDE for the denoising variant; with ``x0`` given, uses the
    analytic real score instead of the network.  Ref: sde_utils.py:483-500.
    """
    T = sde.T if steps is None else steps
    batch = xt.shape[0]

    def step(x, t, z):
        if x0 is not None:
            score = sde.get_real_score(x, x0, t)
        else:
            noise_pred = noise_fn(x, _tvec(batch, t))
            score = sde.score_from_noise(noise_pred, t)
        return sde.reverse_sde_step(x, score, t, z)

    x, states = _scan_with_noise(step, xt, _ts_desc(T), key, noise_seq, return_all)
    return _maybe_all(x, states, return_all)


def dsde_reverse_ode(
    sde: DenoisingSDE,
    noise_fn: UncondNoiseFn,
    xt: Array,
    steps: Optional[int] = None,
    return_all: bool = False,
):
    """Deterministic reverse ODE (the denoising task's test-time sampler,
    started at the optimal timestep for the input noise level).

    Ref: sde_utils.py:502-522; models/denoising_model.py:162-170
    (denoising-sde task).
    """
    T = sde.T if steps is None else steps
    batch = xt.shape[0]

    def body(x, t):
        noise_pred = noise_fn(x, _tvec(batch, t))
        score = sde.score_from_noise(noise_pred, t)
        x = sde.reverse_ode_step(x, score, t)
        return x, (x if return_all else None)

    x, states = jax.lax.scan(body, xt, _ts_desc(T))
    return _maybe_all(x, states, return_all)


def dsde_optimal_reverse(
    sde: DenoisingSDE,
    xt: Array,
    x0: Array,
    steps: Optional[int] = None,
    return_all: bool = False,
):
    """Ref: sde_utils.py:571-577."""
    T = sde.T if steps is None else steps

    def body(x, t):
        x = sde.reverse_optimum_step(x, x0, t)
        return x, (x if return_all else None)

    x, states = jax.lax.scan(body, xt, _ts_desc(T))
    return _maybe_all(x, states, return_all)
