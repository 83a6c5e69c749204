"""Chain-level sampler parity against the reference's torch loops.

Runs the reference's ACTUAL python sampling loops — ``reverse_sde`` /
``reverse_posterior`` / ``reverse_ode`` / ``forward`` from
``codes/utils/sde_utils.py:242-299`` and the DenoisingSDE variants
(``:483-522,550-554``) — end to end against this repo's single-program
``lax.scan`` samplers, with the SAME transplanted weights and the SAME
per-step noise draws (``torch.randn_like`` is monkeypatched to pop from a
pre-drawn stack; the scan side consumes the identical stack via
``noise_seq``).

This pins exactly the composition where silent drift hides: noise threading
order, the t in 1..T off-by-one at chain level, posterior std clamping, and
the encode -> reverse -> decode latent pipeline
(latent_denoising_model.py:177-191).  It is the strongest Rain100H-parity
evidence obtainable without the published assets (see PARITY.md §"north
star"); measured end-state deltas are recorded there.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

import transplant_check as tc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(tc.REFERENCE, "codes")),
    reason="reference sources not available",
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_sde_tpu.sde import (  # noqa: E402
    IRSDE,
    DenoisingSDE,
    samplers,
)
from image_restoration_sde_tpu.utils.torch_import import apply_rules  # noqa: E402

SIZE = 32
BATCH = 2
T_CHAIN = 25  # net-driven chains; pure-math chains run the full T=100


def _load_ref_sde_utils():
    """Import the reference sde_utils module by path (torchvision, which it
    imports only for optional PNG dumps, is absent from this image — stub
    the one symbol it pulls)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    path = os.path.join(tc.REFERENCE, "codes", "utils", "sde_utils.py")
    spec = importlib.util.spec_from_file_location("ref_sde_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _NoiseStack:
    """Replacement for torch.randn_like popping pre-drawn NCHW draws in
    order — the reference consumes exactly one draw per stochastic step."""

    def __init__(self, stack_nchw: np.ndarray):
        self.stack = [torch.from_numpy(z) for z in stack_nchw]
        self.i = 0

    def __call__(self, x, **kwargs):
        z = self.stack[self.i]
        self.i += 1
        assert tuple(z.shape) == tuple(x.shape), (z.shape, x.shape)
        return z.to(x.dtype)


def _transplanted_pair(arch, setting, seed):
    """(torch net [randomized], flax net, flax params) for one architecture."""
    tnet = tc.build_torch_net(arch, setting)
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in tnet.parameters():
            p.normal_(0.0, 0.05)
    state_dict = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    fnet = tc.build_flax_net(arch, setting)
    rng = np.random.RandomState(seed)
    in_ch = int(setting.get("in_nc") or setting.get("img_channel")
                or setting.get("in_ch") or 3)
    dummy = jnp.asarray(rng.rand(1, 16, 16, in_ch), jnp.float32)
    if arch == "UNet":
        params = jax.jit(fnet.init)(jax.random.PRNGKey(0), dummy)
    elif arch == "DenoisingUNet":
        params = jax.jit(lambda k: fnet.init(k, dummy, None, jnp.ones((1,))))(
            jax.random.PRNGKey(0))
    else:
        params = jax.jit(fnet.init)(
            jax.random.PRNGKey(0), dummy, dummy, jnp.ones((1,)))
    params = apply_rules(params, state_dict, tc.flax_rules(arch, setting))
    return tnet, fnet, params


@pytest.fixture(scope="module")
def ref():
    return _load_ref_sde_utils()


@pytest.fixture(scope="module")
def unet_pair():
    return _transplanted_pair(
        "ConditionalUNet", tc.DEFAULT_SETTINGS["ConditionalUNet"], seed=3)


@pytest.fixture(scope="module")
def irsde_pair(ref, unet_pair):
    """Matching (reference IRSDE with model set, jax IRSDE, noise_fn)."""
    tnet, fnet, params = unet_pair
    rsde = ref.IRSDE(max_sigma=10, T=T_CHAIN, schedule="cosine", eps=0.005,
                     device=None)
    rsde.set_model(tnet)
    jsde = IRSDE.create(max_sigma=10.0, T=T_CHAIN, schedule="cosine", eps=0.005)

    def noise_fn(x, mu, tvec):
        return fnet.apply(params, x, mu, tvec)

    return rsde, jsde, noise_fn


def _chain_inputs(seed, n_noise, channels=3):
    rng = np.random.RandomState(seed)
    lq = rng.rand(BATCH, channels, SIZE, SIZE).astype(np.float32)
    gt = rng.rand(BATCH, channels, SIZE, SIZE).astype(np.float32)
    noise = rng.standard_normal(
        (n_noise, BATCH, channels, SIZE, SIZE)).astype(np.float32)
    return lq, gt, noise


def _nhwc(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, -3, -1))


def _delta(t_out_nchw, j_out_nhwc):
    t = np.moveaxis(t_out_nchw.detach().numpy(), 1, -1)
    return float(np.abs(t - np.asarray(j_out_nhwc)).max())


def test_reverse_sde_chain(ref, irsde_pair, monkeypatch):
    """T sequential net calls + per-step dispersion noise.  Ref
    sde_utils.py:252-266 vs samplers.reverse_sde."""
    rsde, jsde, noise_fn = irsde_pair
    lq, _, noise = _chain_inputs(10, n_noise=T_CHAIN + 1)

    # x_T = LQ + max_sigma * eps on both sides from the same draw
    # (ref noise_state, sde_utils.py:360-361)
    xt = lq + float(rsde.max_sigma) * noise[0]

    rsde.set_mu(torch.from_numpy(lq))
    monkeypatch.setattr(torch, "randn_like", _NoiseStack(noise[1:]))
    with torch.no_grad():
        t_out = rsde.reverse_sde(torch.from_numpy(xt))

    j_out = jax.jit(
        lambda x, mu, ns: samplers.reverse_sde(jsde, noise_fn, x, mu, noise_seq=ns)
    )(_nhwc(xt), _nhwc(lq), _nhwc(noise[1:]))

    d = _delta(t_out, j_out)
    print(f"reverse_sde chain T={T_CHAIN}: max|delta| = {d:.3e}")
    assert d < 3e-4


def test_reverse_posterior_chain(ref, irsde_pair, monkeypatch):
    """DDPM-style ancestral chain (2024 update): x0-estimate, posterior mean,
    log-clamped std.  Ref sde_utils.py:284-299,219-223."""
    rsde, jsde, noise_fn = irsde_pair
    lq, _, noise = _chain_inputs(11, n_noise=T_CHAIN + 1)
    xt = lq + float(rsde.max_sigma) * noise[0]

    rsde.set_mu(torch.from_numpy(lq))
    monkeypatch.setattr(torch, "randn_like", _NoiseStack(noise[1:]))
    with torch.no_grad():
        t_out = rsde.reverse_posterior(torch.from_numpy(xt))

    j_out = jax.jit(
        lambda x, mu, ns: samplers.reverse_posterior(
            jsde, noise_fn, x, mu, noise_seq=ns)
    )(_nhwc(xt), _nhwc(lq), _nhwc(noise[1:]))

    d = _delta(t_out, j_out)
    print(f"reverse_posterior chain T={T_CHAIN}: max|delta| = {d:.3e}")
    assert d < 3e-4


def test_reverse_ode_chain(ref, irsde_pair, monkeypatch):
    """Deterministic probability-flow chain.  Ref sde_utils.py:268-282."""
    rsde, jsde, noise_fn = irsde_pair
    lq, _, noise = _chain_inputs(12, n_noise=1)
    xt = lq + float(rsde.max_sigma) * noise[0]

    rsde.set_mu(torch.from_numpy(lq))
    with torch.no_grad():
        t_out = rsde.reverse_ode(torch.from_numpy(xt))

    j_out = jax.jit(
        lambda x, mu: samplers.reverse_ode(jsde, noise_fn, x, mu)
    )(_nhwc(xt), _nhwc(lq))

    d = _delta(t_out, j_out)
    print(f"reverse_ode chain T={T_CHAIN}: max|delta| = {d:.3e}")
    assert d < 3e-4


def test_forward_sde_chain(ref, monkeypatch, tmp_path):
    """Forward mean-reverting chain (interpolation demo; no network).  Ref
    sde_utils.py:242-250 vs samplers.forward_sde — full T=100."""
    T = 100
    rsde = ref.IRSDE(max_sigma=30, T=T, schedule="cosine", eps=0.005, device=None)
    jsde = IRSDE.create(max_sigma=30.0, T=T, schedule="cosine", eps=0.005)
    src, tgt, noise = _chain_inputs(13, n_noise=T)

    rsde.set_mu(torch.from_numpy(tgt))
    monkeypatch.setattr(torch, "randn_like", _NoiseStack(noise))
    with torch.no_grad():
        t_out = rsde.forward(torch.from_numpy(src), save_dir=str(tmp_path))

    j_out = jax.jit(
        lambda x, mu, ns: samplers.forward_sde(jsde, x, mu, noise_seq=ns)
    )(_nhwc(src), _nhwc(tgt), _nhwc(noise))

    d = _delta(t_out, j_out)
    print(f"forward chain T={T}: max|delta| = {d:.3e}")
    assert d < 1e-5


def test_dsde_analytic_reverse_chain(ref, monkeypatch):
    """DenoisingSDE reverse SDE with the ANALYTIC real score (x0 given, no
    network) over the full T=100 — pure chain math incl. the (1+A) drift.
    Ref sde_utils.py:483-500,450-452."""
    T = 100
    rsde = ref.DenoisingSDE(max_sigma=50, T=T, schedule="cosine", device=None)
    jsde = DenoisingSDE.create(max_sigma=50.0, T=T, schedule="cosine")
    _, gt, noise = _chain_inputs(14, n_noise=T + 1)
    xt = gt + float(rsde.max_sigma) * noise[0]

    monkeypatch.setattr(torch, "randn_like", _NoiseStack(noise[1:]))
    with torch.no_grad():
        t_out = rsde.reverse_sde(torch.from_numpy(xt), x0=torch.from_numpy(gt))

    j_out = jax.jit(
        lambda x, x0, ns: samplers.dsde_reverse_sde(
            jsde, None, x, x0=x0, noise_seq=ns)
    )(_nhwc(xt), _nhwc(gt), _nhwc(noise[1:]))

    d = _delta(t_out, j_out)
    print(f"dsde analytic reverse chain T={T}: max|delta| = {d:.3e}")
    assert d < 1e-5


def test_dsde_optimal_timestep_ode_chain(ref):
    """The denoising-sde task's test path: map the degradation sigma to the
    optimal start timestep, then run the reverse ODE from there with the
    (unconditional, full-mid-attention) net.  Ref sde_utils.py:502-522,
    550-554; models/denoising_model.py:162-170."""
    T = 100
    sigma = 25.0
    tnet, fnet, params = _transplanted_pair(
        "DenoisingUNet", tc.DEFAULT_SETTINGS["DenoisingUNet"], seed=4)
    rsde = ref.DenoisingSDE(max_sigma=50, T=T, schedule="cosine", device=None)
    rsde.set_model(tnet)
    jsde = DenoisingSDE.create(max_sigma=50.0, T=T, schedule="cosine")

    t_start_ref = int(rsde.get_optimal_timestep(sigma))
    t_start_jax = int(jsde.get_optimal_timestep(sigma))
    assert t_start_ref == t_start_jax

    _, gt, noise = _chain_inputs(15, n_noise=1)
    xt = gt + (sigma / 255.0) * noise[0]

    with torch.no_grad():
        t_out = rsde.reverse_ode(torch.from_numpy(xt), T=t_start_ref)

    def noise_fn(x, tvec):
        return fnet.apply(params, x, None, tvec)

    j_out = jax.jit(
        lambda x: samplers.dsde_reverse_ode(jsde, noise_fn, x, steps=t_start_jax)
    )(_nhwc(xt))

    d = _delta(t_out, j_out)
    print(f"dsde optimal-t({t_start_ref}) ode chain: max|delta| = {d:.3e}")
    assert d < 3e-4


def test_latent_pipeline_chain(ref, monkeypatch):
    """Refusion pipeline end to end: compressor encode -> reverse SDE in
    latent space -> decode with the LQ skips, both sides from the same
    weights and noise.  Ref latent_denoising_model.py:177-191."""
    comp_setting = tc.DEFAULT_SETTINGS["UNet"]
    tcomp, fcomp, comp_params = _transplanted_pair("UNet", comp_setting, seed=5)
    naf_setting = {"img_channel": 4, "width": 8, "enc_blk_nums": [1, 1],
                   "middle_blk_num": 1, "dec_blk_nums": [1, 1]}
    tnaf, fnaf, naf_params = _transplanted_pair(
        "ConditionalNAFNet", naf_setting, seed=6)

    T = T_CHAIN
    rsde = ref.IRSDE(max_sigma=50, T=T, schedule="cosine", eps=0.005, device=None)
    rsde.set_model(tnaf)
    jsde = IRSDE.create(max_sigma=50.0, T=T, schedule="cosine", eps=0.005)

    lq, _, _ = _chain_inputs(16, n_noise=0)
    lat_hw = SIZE // 4  # ch_mult [1,2,4] -> 1/4 res, embed_dim 4 channels
    rng = np.random.RandomState(17)
    lat_noise = rng.standard_normal(
        (T + 1, BATCH, 4, lat_hw, lat_hw)).astype(np.float32)

    # torch side
    with torch.no_grad():
        lat_lq_t, hidden_t = tcomp.encode(torch.from_numpy(lq))
        assert tuple(lat_lq_t.shape) == (BATCH, 4, lat_hw, lat_hw)
        xt_t = lat_lq_t + float(rsde.max_sigma) * torch.from_numpy(lat_noise[0])
        rsde.set_mu(lat_lq_t)
        monkeypatch.setattr(torch, "randn_like", _NoiseStack(lat_noise[1:]))
        lat_out_t = rsde.reverse_sde(xt_t)
        out_t = tcomp.decode(lat_out_t, hidden_t)

    # jax side (same weights, same noise, NHWC)
    def noise_fn(x, mu, tvec):
        return fnaf.apply(naf_params, x, mu, tvec)

    @jax.jit
    def pipeline(lq_j, n0, ns):
        lat_lq, hidden = fcomp.apply(comp_params, lq_j, method=fcomp.encode)
        xt = lat_lq + jsde.max_sigma * n0
        lat_out = samplers.reverse_sde(jsde, noise_fn, xt, lat_lq, noise_seq=ns)
        return fcomp.apply(comp_params, lat_out, hidden, method=fcomp.decode)

    out_j = pipeline(_nhwc(lq), _nhwc(lat_noise[0]), _nhwc(lat_noise[1:]))

    d = _delta(out_t, out_j)
    print(f"latent pipeline chain T={T}: max|delta| = {d:.3e}")
    assert d < 3e-4
