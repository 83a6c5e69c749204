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
