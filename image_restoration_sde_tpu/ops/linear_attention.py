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

from ..kernel_gate import target_is_tpu
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


# ------------------------------------------------ packed all-heads kernels
#
# The model-facing fast path.  The qkv projection's natural output is
# (B, N, 3*heads*dim_head) with channels ordered [q_h0..q_h3 | k_* | v_*]
# (the reference reshapes it to (B, N, 3, heads, d) — module_util.py:160).
# When heads*dim_head == 128 this maps exactly onto one TPU lane register:
# all four heads are processed TOGETHER as a single 128-wide block, and the
# cross-head garbage the 128x128 MXU computes for free is removed with a
# static block-diagonal mask.  No transposes, no f32 materialization — the
# two kernels read bf16 blocks straight out of the conv's layout:
#
#   kernel A (context):  ctxT[e,d] = sum_n softmaxN(k)[n,d] * v[n,e] / N
#       streaming over N tiles with online max/sum per channel (lane vectors)
#   kernel B (apply):    out[n,e] = sum_d softmaxD(q)[n,d]*d^-.5 * ctxT[e,d]
#       per-head softmax over d via a global-max shift (exact) and a
#       block-diagonal ones matmul for the segment sums (MXU, not shuffles)

_HID = 128  # heads * dim_head the packed kernels are specialized for


def _head_mask(dim_head: int, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (_HID, _HID), 0) // dim_head
    c = jax.lax.broadcasted_iota(jnp.int32, (_HID, _HID), 1) // dim_head
    return (r == c).astype(dtype)


def _ctx_kernel(k_ref, v_ref, o_ref, m_sc, s_sc, acc_sc, *, n_total, dim_head):
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -jnp.inf)
        s_sc[:] = jnp.zeros_like(s_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    k = k_ref[0].astype(jnp.float32)  # (Nt, 128): N on sublanes, d on lanes
    v = v_ref[0].astype(jnp.float32)
    m_old = m_sc[:1]  # (1, 128) per-channel running max over N
    m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
    corr = jnp.exp(m_old - m_new)  # (1, 128) lane vector
    ke = jnp.exp(k - m_new)
    s_sc[:1] = s_sc[:1] * corr + jnp.sum(ke, axis=0, keepdims=True)
    # acc[e, d] += sum_n v[n, e] ke[n, d]  — lanes carry d, so the running
    # corr/s broadcasts are native lane-vector ops
    acc_sc[:] = acc_sc[:] * corr + jax.lax.dot_general(
        v, ke, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_sc[:1] = m_new

    @pl.when(t == nt - 1)
    def _():
        mask = _head_mask(dim_head)
        o_ref[0] = acc_sc[:] * mask / (s_sc[:1] * n_total)


def _apply_kernel(q_ref, ctx_ref, o_ref, *, dim_head):
    q = q_ref[0].astype(jnp.float32)  # (Nt, 128)
    # per-head softmax over d, shifted by the PER-HEAD row max (a global-max
    # shift is exact in real arithmetic but underflows a whole head to 0/0
    # when its logits sit ~88+ below another head's).  The per-head max is
    # built with lane-masked reduces — no reshape/transpose, stays in the
    # native (sublane, lane) layout.
    heads = _HID // dim_head
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, _HID), 1) // dim_head
    m = jnp.zeros_like(q)
    for h in range(heads):
        sel = lane_head == h  # (1, 128), broadcasts over Nt
        mh = jnp.max(jnp.where(sel, q, -jnp.inf), axis=1, keepdims=True)  # (Nt, 1)
        m = m + jnp.where(sel, mh, 0.0)
    e = jnp.exp(q - m)
    seg = jax.lax.dot_general(
        e, _head_mask(dim_head), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nt, 128): each lane gets its head's sum
    qs = e / seg * (dim_head**-0.5)
    # out[n, e] = sum_d qs[n, d] ctxT[e, d]
    o_ref[0] = jax.lax.dot_general(
        qs, ctx_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pick_tile(n: int, limit: int = 2048) -> int:
    for t in (limit, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= limit and n % t == 0:
            return t
    return 0


def _pallas_packed(qkv, dim_head, *, interpret=False):
    B, N, C3 = qkv.shape
    nt = _pick_tile(N)
    grid = (B, N // nt)
    k_spec = pl.BlockSpec((1, nt, _HID), lambda b, t: (b, t, 1), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, nt, _HID), lambda b, t: (b, t, 2), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, nt, _HID), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((1, _HID, _HID), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nt, _HID), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)

    ctx = pl.pallas_call(
        partial(_ctx_kernel, n_total=N, dim_head=dim_head),
        grid=grid,
        in_specs=[k_spec, v_spec],
        out_specs=ctx_spec,
        out_shape=jax.ShapeDtypeStruct((B, _HID, _HID), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, _HID), jnp.float32),   # running max (row 0)
            pltpu.VMEM((8, _HID), jnp.float32),   # running sum (row 0)
            pltpu.VMEM((_HID, _HID), jnp.float32),  # ctx accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )(qkv, qkv)

    return pl.pallas_call(
        partial(_apply_kernel, dim_head=dim_head),
        grid=grid,
        in_specs=[q_spec, ctx_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, _HID), qkv.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )(qkv, ctx)


def _jnp_packed_split(qkv, heads, dim_head):
    """Packed-layout reference composition (same math as module_util.py
    LinearAttention): qkv (B, N, 3*h*d) -> out (B, N, h*d)."""
    B, N, _ = qkv.shape
    x = qkv.astype(jnp.float32).reshape(B, N, 3, heads, dim_head)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (B, N, h, d)
    qs = jax.nn.softmax(q, axis=-1) * (dim_head**-0.5)
    ks = jax.nn.softmax(k, axis=1)
    ctx = jnp.einsum("bnhd,bnhe->bhde", ks, v / N)
    out = jnp.einsum("bnhd,bhde->bnhe", qs, ctx)
    return out.reshape(B, N, heads * dim_head).astype(qkv.dtype)


def _jnp_packed_lanes(qkv, heads, dim_head):
    """Same math, lane-packed: all heads stay side by side in the 128-lane
    channel axis (the conv's natural layout), per-head softmaxes via masked
    reduces and a block-diagonal mask matmul — no rank-5 reshape, so XLA
    emits zero relayout copies around it (the reshape path costs ~30% of
    batch-1 sampler time in transposes).  The cross-head products the full
    128-wide contractions compute are masked off; the FLOP waste (4x on
    ~0.5% of the net's FLOPs) is far below the copy cost it removes.

    Mixed precision: softmax statistics (max/exp/segment sums/divisions)
    always run f32; for bf16 inputs the two context contractions feed the
    MXU bf16 operands with f32 accumulation (preferred_element_type) — the
    bf16 train-forward path (tools/train.py keeps pallas off) otherwise
    pays f32 matmul rates on (B, N, 3*hid) activations."""
    B, N, _ = qkv.shape
    hid = heads * dim_head
    # slice in the INPUT dtype — a whole-tensor f32 cast up front forces XLA
    # to materialize (and relayout-copy) a f32 (B, N, 3*hid) activation;
    # per-consumer converts fuse into the downstream ops instead
    q = qkv[:, :, :hid]
    k = qkv[:, :, hid : 2 * hid]
    v = qkv[:, :, 2 * hid :]
    mask = _head_mask(dim_head)[:hid, :hid]  # (hid, hid) block-diagonal
    mm_dtype = jnp.bfloat16 if qkv.dtype == jnp.bfloat16 else jnp.float32
    f32 = dict(preferred_element_type=jnp.float32)

    # softmax over N per channel (already segment-local), f32 statistics
    ks = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    # ctx[b, d, e] = sum_n ks[b, n, d] v[b, n, e] / N, cross-head terms zeroed
    ctx = jnp.einsum(
        "bnd,bne->bde", ks.astype(mm_dtype), (v / N).astype(mm_dtype), **f32
    ) * mask

    # per-head softmax over d: masked per-head max (exact in any dtype),
    # f32 exp, block-diag row sums on MXU-dtype operands with f32 accum
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hid), 2) // dim_head
    m = jnp.zeros_like(q)
    for h in range(heads):
        sel = lane_head == h
        mh = jnp.max(jnp.where(sel, q, -jnp.inf), axis=2, keepdims=True)
        m = m + jnp.where(sel, mh, 0.0)
    e = jnp.exp(q.astype(jnp.float32) - m.astype(jnp.float32))
    seg = jnp.einsum(
        "bnd,de->bne", e.astype(mm_dtype), mask.astype(mm_dtype), **f32
    )  # each lane: its head's sum
    qs = e / seg * (dim_head**-0.5)
    out = jnp.einsum("bnd,bde->bne", qs.astype(mm_dtype), ctx.astype(mm_dtype), **f32)
    return out.astype(qkv.dtype)


def _jnp_packed(qkv, heads, dim_head):
    if heads * dim_head <= _HID and _HID % dim_head == 0:
        return _jnp_packed_lanes(qkv, heads, dim_head)
    return _jnp_packed_split(qkv, heads, dim_head)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def linear_attention_packed(
    qkv, heads: int = 4, dim_head: int = 32,
    use_pallas: bool = True, interpret: bool = False,
):
    """Fused linear attention on the packed qkv projection.

    qkv: (B, N, 3*heads*dim_head) in the conv's natural channel order
    ([q|k|v] major, head minor).  Returns (B, N, heads*dim_head) in the
    input dtype.  Differentiable (jnp backward)."""
    return _packed_forward(qkv, heads, dim_head, use_pallas, interpret)


def _packed_forward(qkv, heads, dim_head, use_pallas, interpret):
    N = qkv.shape[-2]
    on_tpu = target_is_tpu()  # real backend, or a force_pallas() export trace
    if (
        use_pallas
        and (on_tpu or interpret)
        and heads * dim_head == _HID
        and _HID % dim_head == 0
        and _pick_tile(N)
    ):
        return _pallas_packed(qkv, dim_head, interpret=interpret)
    return _jnp_packed(qkv, heads, dim_head)


def _packed_fwd(qkv, heads, dim_head, use_pallas, interpret):
    return _packed_forward(qkv, heads, dim_head, use_pallas, interpret), (qkv,)


def _packed_bwd(heads, dim_head, use_pallas, interpret, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _jnp_packed(t, heads, dim_head), qkv)
    return vjp(g)


linear_attention_packed.defvjp(_packed_fwd, _packed_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def linear_attention(q, k, v, use_pallas: bool = True, interpret: bool = False):
    """(BH, N, d) fused linear attention; differentiable."""
    return _forward(q, k, v, use_pallas, interpret)


def _forward(q, k, v, use_pallas, interpret):
    N, d = q.shape[-2], q.shape[-1]
    on_tpu = target_is_tpu()  # real backend, or a force_pallas() export trace
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
