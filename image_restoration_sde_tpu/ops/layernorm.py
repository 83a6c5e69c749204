"""Pallas TPU kernel: fused channel LayerNorm (+ optional scale/shift
modulation), the most repeated pointwise op in the NAF/UNet stacks.

Computes, in one VMEM pass over an (S, C) tile:

    y = (x - mean_C) * rsqrt(var_C + eps) * g        [ * (1+scale) + shift ]

matching ChannelLayerNorm (module_util.py:70-79 semantics, f32 stats).
Grid over row tiles; channel axis stays whole (C <= a few thousand).
Forward-only kernel with jnp backward via custom_vjp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..kernel_gate import target_is_tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512


def _jnp_ln(x, g, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g).astype(x.dtype)


def _kernel(x_ref, g_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    o_ref[:] = ((x - mean) * jax.lax.rsqrt(var + eps) * g_ref[:]).astype(o_ref.dtype)


def _pallas_ln(x2d, g, eps, interpret=False):
    S, C = x2d.shape
    rows = min(_ROWS, S)
    grid = (pl.cdiv(S, rows),)
    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, C), x2d.dtype),
        interpret=interpret,
    )(x2d, g)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def channel_layernorm(x, g, eps: float = 1e-5, use_pallas: bool = True, interpret: bool = False):
    """NHWC channel LayerNorm. x: (..., C), g: (C,)."""
    return _forward(x, g, eps, use_pallas, interpret)


def _forward(x, g, eps, use_pallas, interpret):
    on_tpu = target_is_tpu()  # real backend, or a force_pallas() export trace
    if use_pallas and (on_tpu or interpret):
        shape = x.shape
        x2d = x.reshape(-1, shape[-1])
        # pad rows to the tile multiple
        S = x2d.shape[0]
        rows = min(_ROWS, S)
        pad = (-S) % rows
        if pad:
            x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        out = _pallas_ln(x2d, g.astype(jnp.float32), eps, interpret=interpret)
        if pad:
            out = out[:S]
        return out.reshape(shape)
    return _jnp_ln(x, g, eps)


def _fwd(x, g, eps, use_pallas, interpret):
    return _forward(x, g, eps, use_pallas, interpret), (x, g)


def _bwd(eps, use_pallas, interpret, res, grad):
    x, g = res
    _, vjp = jax.vjp(lambda x_, g_: _jnp_ln(x_, g_, eps), x, g)
    return vjp(grad)


channel_layernorm.defvjp(_fwd, _bwd)
