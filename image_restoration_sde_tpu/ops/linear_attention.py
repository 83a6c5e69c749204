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

# Mosaic's scoped-vmem budget (~13 MB) must hold each operand block twice
# (pipeline double buffering) for q, k, v plus the output block: the usable
# per-slice budget works out to ~0.75 MB per (N, d) f32 block.  Above that,
# fall back to the XLA composition (N-tiled streaming softmax is future work).
_BLOCK_LIMIT_BYTES = 1024 * 1024


def _jnp_linear_attention(q, k, v):
    """Reference composition. q,k,v: (BH, N, d) f32."""
    d = q.shape[-1]
    N = q.shape[-2]
    qs = jax.nn.softmax(q, axis=-1) * (d**-0.5)
    ks = jax.nn.softmax(k, axis=-2)
    context = jnp.einsum("bnd,bne->bde", ks, v / N)
    return jnp.einsum("bde,bnd->bne", context, qs)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    # blocks are (d, N): head-dim on sublanes (32 ok for f32), space on lanes
    # (N is a multiple of 128 after the conv feature maps) — avoids the 4x
    # lane padding a (N, 32) layout would cost.
    q = q_ref[0].astype(jnp.float32)  # (d, N)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d, N = q.shape

    # softmax over d (sublanes), scaled
    qs = jnp.exp(q - jnp.max(q, axis=0, keepdims=True))
    qs = qs / jnp.sum(qs, axis=0, keepdims=True) * (d**-0.5)

    # softmax over N folded into the contraction:
    # context[d, e] = sum_n ke[d, n] (v[e, n]/N) / ksum[d]
    ke = jnp.exp(k - jnp.max(k, axis=1, keepdims=True))
    ksum = jnp.sum(ke, axis=1, keepdims=True)  # (d, 1)
    context = jax.lax.dot_general(
        ke, v / N, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (d, e)
    context = context / ksum
    # out[e, n] = sum_d context[d, e] qs[d, n]
    out = jax.lax.dot_general(
        context, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_linear_attention(q, k, v, *, interpret=False):
    BH, N, d = q.shape
    qT = q.transpose(0, 2, 1)
    kT = k.transpose(0, 2, 1)
    vT = v.transpose(0, 2, 1)
    grid = (BH,)
    spec = pl.BlockSpec((1, d, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outT = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, d, N), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=10 * 2**20),
    )(qT, kT, vT)
    return outT.transpose(0, 2, 1)


def _fits_vmem(N: int, d: int) -> bool:
    # (d, N) blocks: true size, double-buffered x3 inputs + out within ~10MB
    return N * d * 4 <= _BLOCK_LIMIT_BYTES and N % 128 == 0


# --------------------------------------------------- streaming (N-tiled)
_STREAM_TILE = 2048


def _stream_kernel(q_ref, k_ref, v_ref, o_ref, m_sc, s_sc, ctx_sc, *, n_total):
    ph = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((ph == 0) & (t == 0))
    def _():
        m_sc[:] = jnp.full_like(m_sc, -jnp.inf)
        s_sc[:] = jnp.zeros_like(s_sc)
        ctx_sc[:] = jnp.zeros_like(ctx_sc)

    @pl.when(ph == 0)
    def _():
        k = k_ref[0].astype(jnp.float32)  # (d, Nt)
        v = v_ref[0].astype(jnp.float32)
        m_old = m_sc[:, :1]
        mt = jnp.max(k, axis=1, keepdims=True)
        m_new = jnp.maximum(m_old, mt)
        corr = jnp.exp(m_old - m_new)  # (d, 1)
        ke = jnp.exp(k - m_new)
        s_sc[:, :1] = s_sc[:, :1] * corr + jnp.sum(ke, axis=1, keepdims=True)
        ctx_sc[:] = ctx_sc[:] * corr + jax.lax.dot_general(
            ke, v / n_total, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_sc[:, :1] = m_new

    @pl.when(ph == 1)
    def _():
        q = q_ref[0].astype(jnp.float32)  # (d, Nt)
        d = q.shape[0]
        qs = jnp.exp(q - jnp.max(q, axis=0, keepdims=True))
        qs = qs / jnp.sum(qs, axis=0, keepdims=True) * (d**-0.5)
        context = ctx_sc[:] / s_sc[:, :1]  # (d, e)
        o_ref[0] = jax.lax.dot_general(
            context, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pallas_linear_attention_streaming(q, k, v, *, tile=_STREAM_TILE, interpret=False):
    BH, N, d = q.shape
    NT = N // tile
    qT = q.transpose(0, 2, 1)
    kT = k.transpose(0, 2, 1)
    vT = v.transpose(0, 2, 1)
    spec = pl.BlockSpec((1, d, tile), lambda b, ph, t: (b, 0, t), memory_space=pltpu.VMEM)
    outT = pl.pallas_call(
        partial(_stream_kernel, n_total=N),
        grid=(BH, 2, NT),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, d, N), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((d, 128), jnp.float32),  # running sum
            pltpu.VMEM((d, d), jnp.float32),    # context accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 2**20),
    )(qT, kT, vT)
    return outT.transpose(0, 2, 1)


def _fits_streaming(N: int, d: int) -> bool:
    return N % _STREAM_TILE == 0 and N > _BLOCK_LIMIT_BYTES // (d * 4)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def linear_attention(q, k, v, use_pallas: bool = True, interpret: bool = False):
    """(BH, N, d) fused linear attention; differentiable."""
    return _forward(q, k, v, use_pallas, interpret)


def _forward(q, k, v, use_pallas, interpret):
    N, d = q.shape[-2], q.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and (on_tpu or interpret):
        if _fits_vmem(N, d):
            return _pallas_linear_attention(q, k, v, interpret=interpret)
        if _fits_streaming(N, d):
            return _pallas_linear_attention_streaming(q, k, v, interpret=interpret)
    return _jnp_linear_attention(q, k, v)


def _fwd(q, k, v, use_pallas, interpret):
    return _forward(q, k, v, use_pallas, interpret), (q, k, v)


def _bwd(use_pallas, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_jnp_linear_attention, q, k, v)
    return vjp(g)


linear_attention.defvjp(_fwd, _bwd)
