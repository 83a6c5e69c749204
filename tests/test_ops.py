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
