"""NAFNet / latent-compressor tests: golden param counts (measured once
against the reference torch models), shape behavior, importer coverage, and
the Refusion latent training objectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.models.latent_unet import UNet
from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training import build_optimizer, create_train_state
from image_restoration_sde_tpu.training.latent import (
    make_compressor_train_step,
    make_latent_sampler,
    make_latent_train_step,
)
from image_restoration_sde_tpu.utils.torch_import import (
    apply_rules,
    latent_unet_key_rules,
    nafnet_key_rules,
)

NAF_SMALL = dict(img_channel=3, width=16, middle_blk_num=2, enc_blk_nums=(1, 2), dec_blk_nums=(2, 1))
GOLD_NAF_SMALL = 164_771
GOLD_NAF_REFUSION = 76_608_387  # width 64, enc [1,1,1,28], dec [1,1,1,1]
LAT_SMALL = dict(in_ch=3, out_ch=3, ch=8, ch_mult=(1, 2, 4), embed_dim=4)
GOLD_LAT_SMALL = 118_451
GOLD_LAT_DEHAZE = 2_007_859  # ch 8, ch_mult [4,8,8,16], embed_dim 8


def n_params(tree):
    return sum(p.size for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def naf():
    net = ConditionalNAFNet(**NAF_SMALL)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    return net, params


@pytest.fixture(scope="module")
def compressor():
    net = UNet(**LAT_SMALL)
    x = jnp.zeros((2, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    return net, params


def test_nafnet_param_count(naf):
    assert n_params(naf[1]) == GOLD_NAF_SMALL


def test_nafnet_flagship_param_count():
    net = ConditionalNAFNet(
        img_channel=3, width=64, middle_blk_num=1,
        enc_blk_nums=(1, 1, 1, 28), dec_blk_nums=(1, 1, 1, 1),
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(lambda k: net.init(k, x, x, jnp.array([1.0])), jax.random.PRNGKey(0))
    assert n_params(params) == GOLD_NAF_REFUSION


def test_nafnet_shapes_and_grad(naf):
    net, params = naf
    x = jnp.ones((2, 22, 17, 3)) * 0.4  # non-multiple -> zero pad + crop
    out = jax.jit(net.apply)(params, x, x * 0.5, jnp.array([3.0, 9.0]))
    assert out.shape == (2, 22, 17, 3)
    g = jax.jit(jax.grad(lambda p: jnp.mean(net.apply(p, x, x, jnp.array([1.0, 2.0])) ** 2)))(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_nafnet_import_rules_cover_all(naf):
    from jax.tree_util import tree_flatten_with_path

    _, params = naf
    rules = nafnet_key_rules(NAF_SMALL["enc_blk_nums"], NAF_SMALL["middle_blk_num"], NAF_SMALL["dec_blk_nums"])
    flat, _ = tree_flatten_with_path(params)
    for path, leaf in flat:
        fpath = "/".join(str(k.key) for k in path)[len("params/"):]
        assert fpath in rules, fpath


def test_latent_unet_param_count(compressor):
    assert n_params(compressor[1]) == GOLD_LAT_SMALL


def test_latent_unet_dehazing_param_count():
    net = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(4, 8, 8, 16), embed_dim=8)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(lambda k: net.init(k, x), jax.random.PRNGKey(0))
    assert n_params(params) == GOLD_LAT_DEHAZE


def test_latent_unet_encode_decode(compressor):
    net, params = compressor
    x = jnp.ones((1, 19, 21, 3)) * 0.5
    latent, hs = jax.jit(lambda p, x: net.apply(p, x, method=net.encode))(params, x)
    # deepest level keeps resolution: 1/2^(depth-1) spatial (24x24 pad -> 6x6)
    assert latent.shape == (1, 6, 6, 4)
    out = jax.jit(lambda p, l, h: net.apply(p, l, h, (19, 21), method=net.decode))(params, latent, hs)
    assert out.shape == (1, 19, 21, 3)


def test_latent_unet_import_rules_cover_all(compressor):
    from jax.tree_util import tree_flatten_with_path

    _, params = compressor
    rules = latent_unet_key_rules(depth=len(LAT_SMALL["ch_mult"]))
    flat, _ = tree_flatten_with_path(params)
    for path, leaf in flat:
        fpath = "/".join(str(k.key) for k in path)[len("params/"):]
        assert fpath in rules, fpath


def test_registry_has_all_networks():
    assert build_network("ConditionalNAFNet", {"width": 8, "enc_blk_nums": [1], "dec_blk_nums": [1]}).width == 8
    assert build_network("UNet", {"ch": 8, "ch_mult": [1, 2], "embed_dim": 4}).ch == 8


# ---------------------------------------------------- latent training stack
def test_compressor_training_decreases_loss(compressor):
    net, params = compressor
    tx = build_optimizer("Adam", 2e-3, 0.9, 0.99)
    state = create_train_state(params, tx)

    def encode_fn(p, x):
        return net.apply(p, x, method=net.encode)

    def decode_fn(p, l, h):
        return net.apply(p, l, h, method=net.decode)

    step = jax.jit(make_compressor_train_step(encode_fn, decode_fn, tx))
    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (2, 16, 16, 3))
    gt = jnp.clip(lq + 0.15, 0, 1)
    losses = []
    for _ in range(40):
        state, m = step(state, lq, gt, key)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    assert {"loss_rec", "loss_rep", "loss_reg"} <= set(m)


def test_latent_diffusion_step_and_sampler(compressor):
    net, lat_params = compressor
    sde = IRSDE.create(max_sigma=50.0, T=10, schedule="cosine", eps=0.005)
    score = ConditionalNAFNet(img_channel=LAT_SMALL["embed_dim"], width=8,
                              middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,))
    lat = jnp.zeros((2, 4, 4, 4))
    sparams = jax.jit(score.init)(jax.random.PRNGKey(1), lat, lat, jnp.array([1.0, 2.0]))
    tx = build_optimizer("Lion", 3e-5, 0.9, 0.99)
    state = create_train_state(sparams, tx)

    def encode_fn(p, x):
        return net.apply(p, x, method=net.encode)

    def decode_fn(p, l, h):
        return net.apply(p, l, h, method=net.decode)

    step = jax.jit(
        make_latent_train_step(sde, score.apply, encode_fn, lat_params, tx)
    )
    key = jax.random.PRNGKey(2)
    lq = jax.random.uniform(key, (2, 16, 16, 3))
    gt = jnp.clip(lq + 0.1, 0, 1)
    state, m = step(state, lq, gt, key)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1

    sample = make_latent_sampler(sde, score.apply, encode_fn, decode_fn, lat_params, mode="sde")
    out = sample(state.params, lq, key)
    assert out.shape == lq.shape and bool(jnp.isfinite(out).all())


def test_sample_chunk_divisor_fallback():
    from image_restoration_sde_tpu.sampling import _sample_chunk

    assert _sample_chunk(16, 8) == 8
    assert _sample_chunk(12, 8) == 6  # nearest divisor >= want//2
    assert _sample_chunk(11, 8) == 11  # coprime: never serialize to ~1
    assert _sample_chunk(4, 8) == 4
    assert _sample_chunk(16, 0) == 16  # chunk <= 0 disables chunking


def test_latent_sampler_chunked_path(compressor, monkeypatch):
    """B=4 with chunk 2 runs the lax.map branch: traced at the chunk size,
    deterministic, and each chunk's output independent of the others'
    inputs (catches lq/cond reshape misalignment)."""
    monkeypatch.setenv("IRSDE_SAMPLE_CHUNK", "2")
    net, lat_params = compressor
    sde = IRSDE.create(max_sigma=50.0, T=4, schedule="cosine", eps=0.005)
    traced_batches = []

    def encode_fn(p, x):
        traced_batches.append(x.shape[0])
        return net.apply(p, x, method=net.encode)

    def decode_fn(p, l, h):
        return net.apply(p, l, h, method=net.decode)

    def apply_fn(params, xt, mu, tvec, cond):
        # analytic score net that *uses* cond, so chunk alignment is visible
        return mu - xt + 0.1 * cond[:, None, None, :]

    sample = make_latent_sampler(
        sde, apply_fn, encode_fn, decode_fn, lat_params, mode="sde"
    )
    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (4, 16, 16, 3))
    cond = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    out = sample({}, lq, key, cond)
    assert out.shape == lq.shape and bool(jnp.isfinite(out).all())
    assert traced_batches == [2]  # chunked: one trace at the chunk size
    assert bool((sample({}, lq, key, cond) == out).all())  # deterministic
    # mutate chunk 1 only: chunk 0's output must be bitwise unchanged
    lq2 = lq.at[2:].set(jax.random.uniform(jax.random.PRNGKey(9), (2, 16, 16, 3)))
    cond2 = cond.at[2:].add(5.0)
    out2 = sample({}, lq2, key, cond2)
    assert bool((out2[:2] == out[:2]).all())
    assert not bool((out2[2:] == out[2:]).all())


def test_latent_sampler_sharded_input_not_chunked(compressor, monkeypatch):
    """Data-parallel sampling must not be lax.map-serialized: a sharded
    batch bypasses chunking (traced at the full global batch)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("IRSDE_SAMPLE_CHUNK", "2")
    net, lat_params = compressor
    sde = IRSDE.create(max_sigma=50.0, T=4, schedule="cosine", eps=0.005)
    traced_batches = []

    def encode_fn(p, x):
        traced_batches.append(x.shape[0])
        return net.apply(p, x, method=net.encode)

    def decode_fn(p, l, h):
        return net.apply(p, l, h, method=net.decode)

    def apply_fn(params, xt, mu, tvec):
        return mu - xt

    sample = make_latent_sampler(
        sde, apply_fn, encode_fn, decode_fn, lat_params, mode="sde"
    )
    mesh = Mesh(np.array(jax.devices()), ("data",))
    lq = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3)),
        NamedSharding(mesh, P("data")),
    )
    out = sample({}, lq, jax.random.PRNGKey(1))
    assert out.shape == lq.shape and bool(jnp.isfinite(out).all())
    assert traced_batches == [8]  # no chunking on sharded inputs

    # a merely REPLICATED multi-device input (multi-host validation) still
    # holds the full batch per device and must keep chunking
    traced_batches.clear()
    lq_rep = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3)),
        NamedSharding(mesh, P()),
    )
    out2 = sample({}, lq_rep, jax.random.PRNGKey(1))
    assert out2.shape == lq_rep.shape
    assert traced_batches == [2]  # replicated: chunked at IRSDE_SAMPLE_CHUNK
