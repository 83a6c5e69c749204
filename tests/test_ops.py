"""Pallas kernel tests (interpret mode on CPU): numerical parity with the
jnp reference compositions and gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu.ops.layernorm import _jnp_ln, channel_layernorm
from image_restoration_sde_tpu.ops.linear_attention import (
    _jnp_linear_attention,
    linear_attention,
)


def test_linear_attention_kernel_matches_reference():
    key = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(key, (3, 8, 64, 32))
    ref = _jnp_linear_attention(q, k, v)
    got = jax.jit(lambda a, b, c: linear_attention(a, b, c, True, True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_linear_attention_grads_match():
    key = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(key, (3, 2, 32, 16))

    def loss_kernel(q, k, v):
        return jnp.sum(linear_attention(q, k, v, True, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_jnp_linear_attention(q, k, v) ** 2)

    g1 = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_channel_layernorm_kernel_matches_reference():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 9, 7, 48))  # odd spatial -> row padding
    g = jax.random.normal(jax.random.PRNGKey(3), (48,)) + 1.0
    ref = _jnp_ln(x, g, 1e-5)
    got = jax.jit(lambda a, b: channel_layernorm(a, b, 1e-5, True, True))(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_channel_layernorm_grads():
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 32))
    g = jnp.ones((32,))
    g1 = jax.jit(jax.grad(lambda a: jnp.sum(channel_layernorm(a, g, 1e-5, True, True) ** 3)))(x)
    g2 = jax.jit(jax.grad(lambda a: jnp.sum(_jnp_ln(a, g, 1e-5) ** 3)))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_naf_stack_kernel_matches_flax_blocks():
    # kernel output == the flax NAFBlock stack, via stacked params
    from image_restoration_sde_tpu.models.nafnet import NAFBlock
    from image_restoration_sde_tpu.models.modules import simple_gate
    from image_restoration_sde_tpu.ops.naf_stack import naf_stack, stack_middle_params
    from flax import linen as nn

    K, B, H, W, C = 3, 2, 8, 8, 32

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            for i in range(K):
                x = NAFBlock(C, name=f"mid_block{i}")(x, t)
            return x

    net = Stack()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 0.2
    temb = jax.random.normal(jax.random.PRNGKey(1), (B, 16))
    params = jax.jit(net.init)(jax.random.PRNGKey(2), x, temb)
    want = jax.jit(net.apply)(params, x, temb)

    stacked = stack_middle_params(params, temb, K)
    got = jax.jit(lambda a, s: naf_stack(a, s, 1e-5, True, True))(x, stacked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # jnp fallback agrees too
    got2 = jax.jit(lambda a, s: naf_stack(a, s, 1e-5, False, False))(x, stacked)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=2e-5)


def test_naf_stack_batch_chunking_matches_unchunked(monkeypatch):
    # (batch_chunks, K) grid: force a budget that splits B=4 into 4 chunks
    # of 1 and check parity with the jnp composition (incl. per-chunk tmod)
    from image_restoration_sde_tpu.ops import naf_stack as ns

    K, B, H, W, C = 2, 4, 8, 8, 32
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (B, H, W, C)) * 0.2
    stacked = {}
    for i, name in enumerate(ns._WEIGHT_KEYS):
        k2 = jax.random.fold_in(key, i)
        shapes = {
            "w1": (K, C, 2 * C), "b1": (K, 1, 2 * C), "wdw": (K, 3, 3, 2 * C),
            "b2": (K, 1, 2 * C), "wsca": (K, C, C), "bsca": (K, 1, C),
            "w3": (K, C, C), "b3": (K, 1, C), "w4": (K, C, 2 * C),
            "b4": (K, 1, 2 * C), "w5": (K, C, C), "b5": (K, 1, C),
            "g1": (K, 1, C), "g2": (K, 1, C), "beta": (K, 1, C),
            "gamma": (K, 1, C), "tmod": (K, B, 4 * C),
        }
        stacked[name] = jax.random.normal(k2, shapes[name]) * 0.1

    per_sample = H * W * C * 4
    monkeypatch.setattr(ns, "_CHUNK_VMEM_BYTES", per_sample)  # bc == 1
    assert ns.batch_chunk(x.shape) == 1
    got = jax.jit(lambda a, s: ns.naf_stack(a, s, 1e-5, True, True))(x, stacked)
    want = ns._jnp_naf_stack(x, stacked, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    monkeypatch.setattr(ns, "_CHUNK_VMEM_BYTES", per_sample // 2)  # too small
    assert ns.batch_chunk(x.shape) == 0


def test_streaming_linear_attention_matches_reference():
    from image_restoration_sde_tpu.ops.linear_attention import (
        _pallas_linear_attention_streaming,
    )

    key = jax.random.PRNGKey(3)
    q, k, v = jax.random.normal(key, (3, 2, 4096, 32))
    ref = _jnp_linear_attention(q, k, v)
    got = jax.jit(
        lambda a, b, c: _pallas_linear_attention_streaming(a, b, c, tile=1024, interpret=True)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_linear_attention_matches_composition():
    """The packed all-heads kernel must equal the reference composition
    (module_util.py:150-178 math) on the conv's natural (B, N, 3*h*d)
    layout, including the block-diagonal cross-head masking."""
    from image_restoration_sde_tpu.ops.linear_attention import (
        _jnp_packed,
        _pallas_packed,
    )

    key = jax.random.PRNGKey(7)
    for B, N in [(2, 1024), (1, 576)]:
        qkv = jax.random.normal(key, (B, N, 384), jnp.float32) * 2.0
        # per-head composition via the old (BH, N, d) path
        x = qkv.reshape(B, N, 3, 4, 32)
        to_bh = lambda t: t.transpose(0, 2, 1, 3).reshape(B * 4, N, 32)
        ref = _jnp_linear_attention(to_bh(x[:, :, 0]), to_bh(x[:, :, 1]), to_bh(x[:, :, 2]))
        ref = ref.reshape(B, 4, N, 32).transpose(0, 2, 1, 3).reshape(B, N, 128)
        got_jnp = _jnp_packed(qkv, 4, 32)
        got_pal = jax.jit(lambda t: _pallas_packed(t, 32, interpret=True))(qkv)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        assert float(jnp.max(jnp.abs(got_jnp - ref))) / scale < 1e-5
        assert float(jnp.max(jnp.abs(got_pal - ref))) / scale < 1e-4


def test_flash_mha_matches_reference_and_grads():
    """DiT flash attention (ops/flash_attention.py): forward parity with the
    einsum reference in interpret mode, and usable grads (einsum-recompute
    custom_vjp)."""
    from image_restoration_sde_tpu.ops.flash_attention import _ref_mha, flash_mha

    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    B, N, H, D = 2, 512, 4, 64
    q = jax.random.normal(kq, (B, N, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, N, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, N, H, D), jnp.float32)
    scale = D**-0.5

    ref = _ref_mha(q, k, v, scale)
    got = jax.jit(lambda a, b, c: flash_mha(a, b, c, scale, True))(q, k, v)
    sc = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert float(jnp.max(jnp.abs(got - ref))) / sc < 1e-5

    g_ref = jax.grad(lambda a: jnp.sum(_ref_mha(a, k, v, scale) ** 2))(q)
    g_got = jax.grad(lambda a: jnp.sum(flash_mha(a, k, v, scale, True) ** 2))(q)
    gs = float(jnp.max(jnp.abs(g_ref))) + 1e-30
    assert float(jnp.max(jnp.abs(g_got - g_ref))) / gs < 1e-5


def test_packed_linear_attention_outlier_head_no_nan():
    """Per-head softmax shift: a head whose q-logits sit ~120 below another
    head's max must still produce finite, correct outputs (a global-max
    shift underflows the whole head's exp to 0 and yields 0/0 NaN)."""
    from image_restoration_sde_tpu.ops.linear_attention import (
        _jnp_packed,
        _pallas_packed,
    )

    key = jax.random.PRNGKey(11)
    qkv = jax.random.normal(key, (1, 256, 384), jnp.float32)
    # q channels of head 0 get a +120 logit offset (trained outlier scale)
    qkv = qkv.at[:, :, :32].add(120.0)
    ref = _jnp_packed(qkv, 4, 32)
    got = jax.jit(lambda t: _pallas_packed(t, 32, interpret=True))(qkv)
    assert bool(jnp.all(jnp.isfinite(got)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-4


def test_packed_linear_attention_bf16_and_grads():
    from image_restoration_sde_tpu.ops.linear_attention import (
        _jnp_packed,
        linear_attention_packed,
    )

    key = jax.random.PRNGKey(3)
    qkv = (jax.random.normal(key, (2, 512, 384), jnp.float32)).astype(jnp.bfloat16)
    out = jax.jit(lambda t: linear_attention_packed(t, 4, 32, True, True))(qkv)
    assert out.dtype == jnp.bfloat16 and out.shape == (2, 512, 128)
    ref = _jnp_packed(qkv, 4, 32).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / scale < 2e-2

    qkv32 = qkv.astype(jnp.float32)
    g_op = jax.grad(lambda t: jnp.sum(linear_attention_packed(t, 4, 32, True, True) ** 2))(qkv32)
    g_ref = jax.grad(lambda t: jnp.sum(_jnp_packed(t, 4, 32) ** 2))(qkv32)
    np.testing.assert_allclose(np.asarray(g_op), np.asarray(g_ref), rtol=0, atol=1e-6)


def test_nafnet_fused_block_run_matches_unfused(monkeypatch):
    """ConditionalNAFNet routes long same-level NAFBlock runs through the
    fused pallas stack (ref arch: DenoisingNAFNet_arch.py:87-188 runs them
    as python-sequential modules); the fused path must match the unfused
    model bit-for-bit at f32 and actually engage."""
    from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
    from image_restoration_sde_tpu.ops import naf_stack as ns

    calls = []
    orig = ns.naf_stack
    monkeypatch.setattr(
        ns, "naf_stack",
        lambda x, s, e, up=True, it=False: (calls.append(x.shape), orig(x, s, e, up, it))[1],
    )
    monkeypatch.setenv("IRSDE_NAF_FUSE_INTERPRET", "1")

    net = ConditionalNAFNet(img_channel=8, width=32, middle_blk_num=1,
                            enc_blk_nums=(1, 5), dec_blk_nums=(1, 1),
                            dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 16, 16, 8), jnp.float32)
    p = net.init(key, x, x, jnp.zeros((2,)))
    fused = net.apply(p, x, x, jnp.array([3.0, 5.0]))
    assert calls == [(2, 8, 8, 64)]  # the 5-block level, fused once

    monkeypatch.setenv("IRSDE_NAF_FUSE_INTERPRET", "0")
    monkeypatch.setenv("IRSDE_DISABLE_PALLAS", "1")
    ref = net.apply(p, x, x, jnp.array([3.0, 5.0]))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=0, atol=1e-6)


def test_flash_mha_head_packing_variants():
    """Packed-head flash kernel: g = 128//D heads share a program. Parity
    must hold for even H (packed pairs at D=64), odd H (packing degrades to
    g=1), quad packing at D=32, and bf16 operands."""
    from image_restoration_sde_tpu.ops.flash_attention import _ref_mha, flash_mha

    key = jax.random.PRNGKey(7)
    for (H, D, dtype, tol) in [(4, 64, jnp.float32, 1e-5),
                               (3, 64, jnp.float32, 1e-5),
                               (8, 32, jnp.float32, 1e-5),
                               (4, 64, jnp.bfloat16, 2e-2)]:
        kq, kk, kv, key = jax.random.split(key, 4)
        B, N = 1, 256
        q = jax.random.normal(kq, (B, N, H, D), dtype)
        k = jax.random.normal(kk, (B, N, H, D), dtype)
        v = jax.random.normal(kv, (B, N, H, D), dtype)
        scale = D**-0.5
        ref = _ref_mha(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), scale)
        got = jax.jit(lambda a, b, c: flash_mha(a, b, c, scale, True))(q, k, v)
        sc = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))) / sc
        assert err < tol, (H, D, dtype, err)


def test_flash_streamed_backward_grad_parity_2048():
    """At >=2048 tokens flash_mha's VJP switches to the q-blocked streamed
    backward (reverse scan, per-block recompute, O(bq x N) memory): grads
    for q, k, AND v must match the full einsum reference."""
    from image_restoration_sde_tpu.ops import flash_attention as fa
    from image_restoration_sde_tpu.ops.flash_attention import _ref_mha, flash_mha

    B, N, H, D = 1, 2048, 2, 64
    assert N >= fa._BLOCKED_BWD_MIN_N  # the streamed path is engaged
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, N, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, N, H, D), jnp.float32)
    scale = D**-0.5

    # the blocked evaluation is the same function value...
    out_blk = jax.jit(lambda a, b, c: fa._blocked_mha(a, b, c, scale))(q, k, v)
    out_ref = _ref_mha(q, k, v, scale)
    sc = float(jnp.max(jnp.abs(out_ref))) + 1e-30
    assert float(jnp.max(jnp.abs(out_blk - out_ref))) / sc < 1e-5

    # ...and the custom_vjp built on it gives the reference's gradients
    def loss(fn):
        return lambda a, b, c: jnp.sum(fn(a, b, c) ** 2)

    g_ref = jax.jit(jax.grad(loss(lambda a, b, c: _ref_mha(a, b, c, scale)),
                             argnums=(0, 1, 2)))(q, k, v)
    g_got = jax.jit(jax.grad(loss(lambda a, b, c: flash_mha(a, b, c, scale, True)),
                             argnums=(0, 1, 2)))(q, k, v)
    for name, gr, gg in zip("qkv", g_ref, g_got):
        m = float(jnp.max(jnp.abs(gr))) + 1e-30
        assert float(jnp.max(jnp.abs(gg - gr))) / m < 1e-5, name
