"""Stereo/Bokeh/DiT/TLSC variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.models.bokeh_nafnet import BokehConditionalNAFNet
from image_restoration_sde_tpu.models.dit import DiT
from image_restoration_sde_tpu.models.modules import local_avg_pool
from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
from image_restoration_sde_tpu.models.stereo_nafnet import StereoConditionalNAFNet




def _activate_residual_scales(params):
    """NAF-style blocks zero-init beta/gamma (branch scales) — set them to 1
    so interaction tests can observe the branches."""
    from jax.tree_util import tree_map_with_path

    def fix(path, leaf):
        name = str(path[-1].key) if path else ""
        if name in ("beta", "gamma"):
            return jnp.ones_like(leaf)
        return leaf

    return tree_map_with_path(fix, params)


def test_stereo_nafnet_shapes_and_grad():
    net = StereoConditionalNAFNet(
        img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,)
    )
    x = jnp.ones((2, 16, 16, 6)) * 0.4  # 6-channel stereo pair
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0, 2.0]))
    out = jax.jit(net.apply)(params, x, x * 0.5, jnp.array([1.0, 2.0]))
    assert out.shape == (2, 16, 16, 6)
    # SCAM params exist (per-block fusion)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("fusion" in "/".join(str(k.key) for k in p) for p, _ in flat)
    g = jax.jit(jax.grad(lambda p: jnp.mean(net.apply(p, x, x, jnp.array([1.0, 2.0])) ** 2)))(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_stereo_eyes_interact():
    # SCAM cross-attention: perturbing the R eye must change the L output
    net = StereoConditionalNAFNet(
        img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,)
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 16, 16, 6))
    params = _activate_residual_scales(jax.jit(net.init)(key, x, x, jnp.array([1.0])))
    apply = jax.jit(net.apply)
    base = apply(params, x, x, jnp.array([1.0]))
    x2 = x.at[..., 3:].add(0.3)  # change only the right eye
    out2 = apply(params, x2, x2, jnp.array([1.0]))
    left_delta = float(jnp.abs(out2[..., :3] - base[..., :3]).max())
    assert left_delta > 1e-6, "no L<->R interaction"


def test_bokeh_nafnet_lens_conditioning():
    net = BokehConditionalNAFNet(
        img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,)
    )
    x = jnp.ones((2, 16, 16, 3)) * 0.4
    lens = (jnp.array([18.0, -40.0]), jnp.array([-40.0, 18.0]), jnp.array([1.0, 2.0]))
    params = _activate_residual_scales(
        jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0, 2.0]), lens_info=lens)
    )
    apply = jax.jit(lambda p, x_, c, t, l: net.apply(p, x_, c, t, lens_info=l))
    out = apply(params, x, x * 0.5, jnp.array([1.0, 2.0]), lens)
    assert out.shape == (2, 16, 16, 3)
    # different lens metadata must change the output
    lens2 = (lens[0] + 10.0, lens[1], lens[2])
    out2 = apply(params, x, x * 0.5, jnp.array([1.0, 2.0]), lens2)
    assert float(jnp.abs(out2 - out).max()) > 1e-6


def test_dit_adaln_zero_and_shapes():
    net = DiT(patch_size=2, in_channels=4, hidden_size=64, depth=2, num_heads=4)
    x = jnp.ones((1, 10, 14, 4)) * 0.3  # non-multiple of patch -> reflect pad
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([5.0]))
    out = jax.jit(net.apply)(params, x, x * 0.5, jnp.array([5.0]))
    assert out.shape == (1, 10, 14, 4)
    # adaLN-Zero: fresh model output is exactly zero (zero-init final linear)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
    g = jax.jit(jax.grad(lambda p: jnp.mean((net.apply(p, x, x, jnp.array([1.0])) - 0.5) ** 2)))(params)
    gnorm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dit_bf16_pins_f32_within_tolerance():
    """bf16 inference (incl. the bf16 adaLN modulation chain) must track the
    f32 path within bf16 rounding — pins the deliberate dtype drift so
    imported-torch-checkpoint outputs can't silently diverge further."""
    kw = dict(patch_size=2, in_channels=4, hidden_size=64, depth=2, num_heads=4)
    net32 = DiT(**kw)
    net16 = DiT(dtype=jnp.bfloat16, **kw)
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (2, 16, 16, 4), jnp.float32)
    c = jax.random.uniform(jax.random.fold_in(key, 1), (2, 16, 16, 4), jnp.float32)
    params = jax.jit(net32.init)(key, x, c, jnp.array([5.0, 9.0]))
    # zero-init adaLN/final would hide the modulation chain: randomize it
    params = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(key, a.shape, a.dtype), params
    )
    o32 = jax.jit(net32.apply)(params, x, c, jnp.array([5.0, 9.0]))
    o16 = jax.jit(net16.apply)(params, x, c, jnp.array([5.0, 9.0]))
    assert o16.dtype == jnp.float32  # outputs are always f32
    scale = float(jnp.max(jnp.abs(o32))) + 1e-30
    rel = float(jnp.max(jnp.abs(o16 - o32))) / scale
    # bf16 has ~2-3 significant decimal digits; the 2-block chain compounds
    # to at most a few percent — fail loudly if a future change exceeds it
    assert rel < 0.05, rel


def test_dit_registry_sizes():
    net = build_network("DiT_S_8", {"in_channels": 8})
    assert net.hidden_size == 384 and net.depth == 12 and net.patch_size == 8


def _check_rules_cover_and_fill(params, rules):
    """Every flax leaf must be rule-covered; synthesize a torch state_dict
    with the inverse shapes and check apply_rules round-trips shapes."""
    from jax.tree_util import tree_flatten_with_path

    from image_restoration_sde_tpu.utils.torch_import import apply_rules

    flat, _ = tree_flatten_with_path(params)
    rng = np.random.RandomState(0)
    sd = {}
    for path, leaf in flat:
        fpath = "/".join(str(k.key) for k in path)[len("params/"):]
        assert fpath in rules, f"no torch mapping for {fpath}"
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
        sd[tkey] = w.astype(np.float32)
    new = apply_rules(params, sd, rules)
    for (_, a), (_, b) in zip(flat, tree_flatten_with_path(new)[0]):
        assert a.shape == b.shape


def test_stereo_import_rules_cover_all():
    from image_restoration_sde_tpu.utils.torch_import import stereo_nafnet_key_rules

    cfg = dict(img_channel=3, width=8, middle_blk_num=2, enc_blk_nums=(1, 2), dec_blk_nums=(2, 1))
    net = StereoConditionalNAFNet(**cfg)
    x = jnp.zeros((2, 16, 16, 6))
    params = jax.eval_shape(lambda k: net.init(k, x, x, jnp.array([1.0, 2.0])), jax.random.PRNGKey(0))
    rules = stereo_nafnet_key_rules(cfg["enc_blk_nums"], cfg["middle_blk_num"], cfg["dec_blk_nums"])
    _check_rules_cover_and_fill(params, rules)


def test_bokeh_import_rules_cover_all():
    from image_restoration_sde_tpu.utils.torch_import import bokeh_nafnet_key_rules

    cfg = dict(img_channel=4, width=8, middle_blk_num=2, enc_blk_nums=(1, 2), dec_blk_nums=(2, 1))
    net = BokehConditionalNAFNet(**cfg)
    x = jnp.zeros((2, 16, 16, 4))
    lens = (jnp.zeros((2,)), jnp.zeros((2,)), jnp.zeros((2,)))
    params = jax.eval_shape(
        lambda k: net.init(k, x, x, jnp.array([1.0, 2.0]), lens_info=lens), jax.random.PRNGKey(0)
    )
    rules = bokeh_nafnet_key_rules(cfg["enc_blk_nums"], cfg["middle_blk_num"], cfg["dec_blk_nums"])
    _check_rules_cover_and_fill(params, rules)


def test_dit_import_rules_cover_all():
    from image_restoration_sde_tpu.utils.torch_import import dit_key_rules, rules_for_network

    net = DiT(patch_size=2, in_channels=4, hidden_size=32, depth=2, num_heads=4)
    x = jnp.zeros((1, 8, 8, 4))
    params = jax.eval_shape(lambda k: net.init(k, x, x, jnp.array([1.0])), jax.random.PRNGKey(0))
    _check_rules_cover_and_fill(params, dit_key_rules(depth=2))
    # ladder-name dispatch
    assert len(rules_for_network("DiT_L_4", {})) == len(dit_key_rules(24))
    assert len(rules_for_network("StereoConditionalNAFNet",
                                 {"enc_blk_nums": [1], "dec_blk_nums": [1]})) > 0


def test_scam_bicubic_matches_torch_interpolate():
    """SCAM's 1/4 downsample is exactly torch F.interpolate bicubic
    (a=-0.75, align_corners=False) — ref stereo arch :36-37."""
    torch = pytest.importorskip("torch")
    from image_restoration_sde_tpu.models.modules import bicubic_resize_weights

    rs = np.random.RandomState(3)
    x = rs.rand(2, 16, 24, 5).astype(np.float32)  # NHWC
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=0.25, mode="bicubic"
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    wh = bicubic_resize_weights(16, 4)
    ww = bicubic_resize_weights(24, 6)
    got = np.einsum("oh,pw,bhwc->bopc", wh, ww, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_local_avg_pool_matches_oracle():
    # oracle: direct window mean + replicate pad (ref local_arch.py:57-72)
    rs = np.random.RandomState(0)
    x = rs.rand(1, 6, 7, 2).astype(np.float32)
    k1, k2 = 3, 4
    H, W = 6, 7
    direct = np.zeros((1, H - k1 + 1, W - k2 + 1, 2), np.float32)
    for i in range(H - k1 + 1):
        for j in range(W - k2 + 1):
            direct[0, i, j] = x[0, i : i + k1, j : j + k2].mean(axis=(0, 1))
    got = np.asarray(jax.jit(lambda a: local_avg_pool(a, k1, k2))(jnp.asarray(x)))
    assert got.shape == x.shape
    # interior equals the direct window mean
    oh, ow = direct.shape[1], direct.shape[2]
    ph, pw = (H - oh) // 2, (W - ow) // 2
    np.testing.assert_allclose(got[0, ph : ph + oh, pw : pw + ow], direct[0], rtol=1e-5)


def test_tlsc_nafnet_behaviour():
    cfg = dict(img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,))
    plain = ConditionalNAFNet(**cfg)
    tlsc = ConditionalNAFNet(tlsc_train_size=(16, 16), **cfg)
    x = jnp.ones((1, 16, 16, 3)) * 0.4
    params = _activate_residual_scales(
        jax.jit(plain.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    )
    # at train size, TLSC kernel (1.5x feature) >= feature -> global stats
    a = jax.jit(plain.apply)(params, x, x, jnp.array([1.0]))
    b = jax.jit(tlsc.apply)(params, x, x, jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # at larger size, local stats kick in and outputs differ
    x2 = jnp.ones((1, 48, 48, 3)) * jnp.linspace(0, 1, 48)[None, :, None, None]
    a2 = jax.jit(plain.apply)(params, x2, x2, jnp.array([1.0]))
    b2 = jax.jit(tlsc.apply)(params, x2, x2, jnp.array([1.0]))
    assert float(jnp.abs(a2 - b2).max()) > 1e-6
    # registry factory
    net = build_network("CNAFNetLocal", {"train_size": (1, 3, 32, 32), **cfg})
    assert net.tlsc_train_size == (32, 32)
