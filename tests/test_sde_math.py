"""Golden-value and closed-form identity tests for the SDE core.

The oracle below re-derives the reference's schedule math (see
codes/utils/sde_utils.py:89-152) independently in float64 numpy; closed-form
identities then pin the step functions without needing the reference at all.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_sde_tpu.sde import IRSDE, DenoisingSDE, build_tables, samplers


# --------------------------------------------------------------- oracle math
def oracle_tables(max_sigma, T, schedule, eps):
    max_sigma = max_sigma / 255.0 if max_sigma >= 1 else max_sigma
    if schedule == "cosine":
        n = T + 2
        x = np.linspace(0, n, n + 1)
        ac = np.cos(((x / n) + 0.008) / 1.008 * np.pi / 2) ** 2
        ac /= ac[0]
        thetas = 1 - ac[1:-1]
    elif schedule == "linear":
        scale = 1000.0 / (T + 1)
        thetas = np.linspace(scale * 1e-4, scale * 0.02, T + 1)
    else:
        thetas = np.ones(T + 1)
    cumsum = np.cumsum(thetas) - thetas[0]
    dt = -math.log(eps) / cumsum[-1]
    sigmas = np.sqrt(2 * thetas * max_sigma**2)
    sigma_bars = np.sqrt(max_sigma**2 * (1 - np.exp(-2 * cumsum * dt)))
    return thetas, sigmas, cumsum, sigma_bars, dt, max_sigma


@pytest.mark.parametrize("schedule", ["cosine", "linear", "constant"])
def test_tables_match_oracle(schedule):
    T, max_sigma, eps = 100, 10.0, 0.005
    tb = build_tables(max_sigma, T, schedule, eps)
    th, sg, cs, sb, dt, ms = oracle_tables(max_sigma, T, schedule, eps)
    assert tb.thetas.shape == (T + 1,)
    np.testing.assert_allclose(tb.thetas, th, rtol=1e-6)
    np.testing.assert_allclose(tb.sigmas, sg, rtol=1e-6)
    np.testing.assert_allclose(tb.thetas_cumsum, cs, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(tb.sigma_bars, sb, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(tb.dt, dt, rtol=1e-6)
    np.testing.assert_allclose(tb.max_sigma, ms, rtol=1e-7)
    # index-0 conventions: cumsum and sigma_bar are 0 ("state 0 never used")
    assert float(tb.thetas_cumsum[0]) == 0.0
    assert float(tb.sigma_bars[0]) == 0.0


def test_terminal_sigma_bar_hits_eps_target():
    # dt is recomputed so exp(-thetas_cumsum[T]*dt) == eps, hence
    # sigma_bar(T) == max_sigma * sqrt(1 - eps^2).
    eps = 0.005
    sde = IRSDE.create(max_sigma=50.0, T=100, schedule="cosine", eps=eps)
    want = float(sde.max_sigma) * math.sqrt(1 - eps**2)
    np.testing.assert_allclose(float(sde.sigma_bar(sde.T)), want, rtol=1e-5)


def test_max_sigma_normalization():
    assert float(IRSDE.create(10.0, 10).max_sigma) == pytest.approx(10 / 255)
    assert float(IRSDE.create(0.5, 10).max_sigma) == pytest.approx(0.5)
    # DenoisingSDE uses strict > 1 (ref sde_utils.py:379)
    assert float(DenoisingSDE.create(1.0, 10).max_sigma) == pytest.approx(1.0)
    assert float(IRSDE.create(1.0, 10).max_sigma) == pytest.approx(1 / 255)


# ------------------------------------------------------- closed-form checks
@pytest.fixture(scope="module")
def sde():
    return IRSDE.create(max_sigma=10.0, T=100, schedule="cosine", eps=0.005)


@pytest.fixture(scope="module")
def imgs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.uniform(k1, (2, 8, 8, 3))
    mu = jax.random.uniform(k2, (2, 8, 8, 3))
    return x0, mu


def test_mu_bar_limits(sde, imgs):
    x0, mu = imgs
    np.testing.assert_allclose(sde.mu_bar(x0, mu, 0), x0, rtol=1e-6)
    # at t=T the mean has decayed to mu + eps*(x0-mu)
    want = mu + 0.005 * (x0 - mu)
    np.testing.assert_allclose(sde.mu_bar(x0, mu, sde.T), want, rtol=1e-3, atol=1e-6)


def test_posterior_mean_identity(sde, imgs):
    # E[x_{t-1} | x_t = mu_bar(t)] == mu_bar(t-1):  term1*B + term2 == C
    x0, mu = imgs
    for t in [1, 7, 50, 100]:
        xt_mean = sde.mu_bar(x0, mu, t)
        got = sde.reverse_optimum_step(xt_mean, x0, mu, t)
        want = sde.mu_bar(x0, mu, t - 1)
        # f32 cancellation in (1-B^2) at small t bounds the achievable match
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-4)


def test_init_state_from_noise_inverts_marginal(sde, imgs):
    x0, mu = imgs
    key = jax.random.PRNGKey(3)
    for t in [1, 42, 100]:
        n = jax.random.normal(key, x0.shape)
        xt = sde.mu_bar(x0, mu, t) + sde.sigma_bar(t) * n
        got = sde.get_init_state_from_noise(xt, mu, n, t)
        np.testing.assert_allclose(got, x0, rtol=2e-2, atol=2e-5)


def test_real_noise_score_consistency(sde, imgs):
    x0, mu = imgs
    t = 33
    key = jax.random.PRNGKey(4)
    xt = sde.mu_bar(x0, mu, t) + sde.sigma_bar(t) * jax.random.normal(key, x0.shape)
    noise = sde.get_real_noise(xt, x0, mu, t)
    score = sde.get_real_score(xt, x0, mu, t)
    np.testing.assert_allclose(sde.score_from_noise(noise, t), score, rtol=1e-5)


def test_generate_random_states_stats(sde):
    # marginal of the sampled noisy state must match mu_bar/sigma_bar
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((512, 4, 4, 3)) * 0.8
    mu = jnp.zeros_like(x0)
    ts, states = sde.generate_random_states(key, x0, mu)
    assert ts.shape == (512, 1, 1, 1) and ts.dtype == jnp.int32
    assert int(ts.min()) >= 1 and int(ts.max()) <= sde.T
    want_mean = sde.mu_bar(x0, mu, ts)
    resid = (states - want_mean) / sde.sigma_bar(ts)
    assert abs(float(resid.mean())) < 0.05
    assert abs(float(resid.std()) - 1.0) < 0.05


def test_optimal_reverse_recovers_x0(sde, imgs):
    # starting from the terminal mean, the closed-form posterior-mean rollout
    # walks back along mu_bar and lands on x0
    x0, mu = imgs
    xT = sde.mu_bar(x0, mu, sde.T)
    got = samplers.optimal_reverse(sde, xT, x0, mu)
    np.testing.assert_allclose(got, x0, rtol=1e-3, atol=1e-5)


def test_reverse_sde_with_oracle_noise_recovers_x0(sde, imgs):
    # a perfect noise predictor should take a noised state back to ~x0
    x0, mu = imgs

    def oracle_noise_fn(x, mu_, tvec):
        t = tvec.reshape(-1, 1, 1, 1)
        return sde.get_real_noise(x, x0, mu_, t)

    key = jax.random.PRNGKey(7)
    xT = sde.mu_bar(x0, mu, sde.T) + sde.sigma_bar(sde.T) * jax.random.normal(
        key, x0.shape
    )
    out = samplers.reverse_sde(sde, oracle_noise_fn, xT, mu, jax.random.PRNGKey(8))
    err = float(jnp.abs(out - x0).mean())
    assert err < 0.05, err
    out_ode = samplers.reverse_ode(sde, oracle_noise_fn, xT, mu)
    assert float(jnp.abs(out_ode - x0).mean()) < 0.08
    out_post = samplers.reverse_posterior(
        sde, oracle_noise_fn, xT, mu, jax.random.PRNGKey(9)
    )
    assert float(jnp.abs(out_post - x0).mean()) < 0.05


def test_forward_sde_approaches_mu(sde, imgs):
    x0, mu = imgs
    xT, states = samplers.forward_sde(
        sde, x0, mu, jax.random.PRNGKey(1), return_all=True
    )
    assert states.shape == (sde.T,) + x0.shape
    # terminal state distributed around mu with std <= max_sigma-ish
    resid = xT - mu
    assert float(jnp.abs(resid.mean())) < 0.05
    assert float(resid.std()) < 3 * float(sde.max_sigma)


def test_samplers_jit_once(sde, imgs):
    x0, mu = imgs
    f = jax.jit(
        lambda xt, mu, key: samplers.reverse_sde(
            sde, lambda x, m, t: jnp.zeros_like(x), xt, mu, key
        )
    )
    out = f(x0, mu, jax.random.PRNGKey(0))
    assert out.shape == x0.shape


# ------------------------------------------------------------ DenoisingSDE
def test_denoising_sde_identities():
    sde = DenoisingSDE.create(max_sigma=25.0, T=100, schedule="cosine")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 8, 8, 3))
    n = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = 40
    xt = x0 + sde.sigma_bar(t) * n
    np.testing.assert_allclose(
        sde.get_init_state_from_noise(xt, n, t), x0, rtol=1e-4, atol=1e-6
    )
    score = sde.get_real_score(xt, x0, t)
    np.testing.assert_allclose(
        sde.get_init_state_from_score(xt, score, t), x0, rtol=1e-4, atol=1e-6
    )
    # weights are sigma^2
    np.testing.assert_allclose(sde.weights(t), sde.sigma(t) ** 2, rtol=1e-6)


def test_denoising_optimal_timestep_roundtrip():
    sde = DenoisingSDE.create(max_sigma=50.0, T=100)
    # the timestep matching sigma_bar(t) must be ~t itself
    for t in [10, 50, 90]:
        sig = float(sde.sigma_bar(t))
        t_hat = int(sde.get_optimal_timestep(sig))
        assert abs(t_hat - t) <= 1, (t, t_hat)


def test_denoising_reverse_with_real_score():
    sde = DenoisingSDE.create(max_sigma=25.0, T=100)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 3))
    n = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    xT = x0 + sde.sigma_bar(sde.T) * n
    out = samplers.dsde_reverse_sde(sde, None, xT, jax.random.PRNGKey(2), x0=x0)
    assert float(jnp.abs(out - x0).mean()) < float(jnp.abs(xT - x0).mean())

    def oracle_noise_fn(x, tvec):
        t = tvec.reshape(-1, 1, 1, 1)
        return sde.get_real_noise(x, x0, t)

    out_ode = samplers.dsde_reverse_ode(sde, oracle_noise_fn, xT)
    assert float(jnp.abs(out_ode - x0).mean()) < 0.1
