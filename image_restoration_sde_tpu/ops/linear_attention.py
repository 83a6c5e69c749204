"""Pallas TPU kernel: fused linear (channel) attention.

The reference LinearAttention (module_util.py:150-178) lowers to three
HBM-bound passes (softmax(q, d), softmax(k, N), two einsums).  This kernel
keeps one (batch*head) slice of q/k/v resident in VMEM and fuses:

    qs = softmax(q, axis=d) * d^-0.5
    ks = softmax(k, axis=N)
    context = ks^T (v/N)          (d x d, MXU)
    out = qs context              (N x d, MXU)

Grid: one program per (batch*head).  Falls back to the jnp composition when
a slice would not fit VMEM.  The public entry `linear_attention` is
differentiable: forward may use the kernel; backward always uses jax.vjp of
the jnp reference (bitwise-equivalent math).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per slice: qkv + out + scratch, f32
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _jnp_linear_attention(q, k, v):
    """Reference composition. q,k,v: (BH, N, d) f32."""
    d = q.shape[-1]
    N = q.shape[-2]
    qs = jax.nn.softmax(q, axis=-1) * (d**-0.5)
    ks = jax.nn.softmax(k, axis=-2)
    context = jnp.einsum("bnd,bne->bde", ks, v / N)
    return jnp.einsum("bde,bnd->bne", context, qs)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # (N, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    N, d = q.shape

    # softmax over d (rows)
    qm = jnp.max(q, axis=-1, keepdims=True)
    qe = jnp.exp(q - qm)
    qs = qe / jnp.sum(qe, axis=-1, keepdims=True) * (d**-0.5)

    # softmax over N (columns)
    km = jnp.max(k, axis=0, keepdims=True)
    ke = jnp.exp(k - km)
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)

    context = jnp.dot(ks.T, v / N, preferred_element_type=jnp.float32)  # (d, d)
    o_ref[0] = jnp.dot(qs, context, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pallas_linear_attention(q, k, v, *, interpret=False):
    BH, N, d = q.shape
    grid = (BH,)
    spec = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, N, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES + 2**20),
    )(q, k, v)


def _fits_vmem(N: int, d: int) -> bool:
    return 4 * N * d * 4 <= _VMEM_LIMIT_BYTES  # q,k,v,out in f32


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def linear_attention(q, k, v, use_pallas: bool = True, interpret: bool = False):
    """(BH, N, d) fused linear attention; differentiable."""
    return _forward(q, k, v, use_pallas, interpret)


def _forward(q, k, v, use_pallas, interpret):
    N, d = q.shape[-2], q.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and _fits_vmem(N, d) and (on_tpu or interpret):
        return _pallas_linear_attention(q, k, v, interpret=interpret)
    return _jnp_linear_attention(q, k, v)


def _fwd(q, k, v, use_pallas, interpret):
    return _forward(q, k, v, use_pallas, interpret), (q, k, v)


def _bwd(use_pallas, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_jnp_linear_attention, q, k, v)
    return vjp(g)


linear_attention.defvjp(_fwd, _bwd)
