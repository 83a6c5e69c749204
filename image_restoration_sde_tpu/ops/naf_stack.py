"""Pallas TPU kernel: fused NAFBlock middle stack.

The Refusion flagship runs 28 sequential NAFBlocks on tiny deep-level
feature maps (8x8x512 for the HR-dehazing latents).  XLA executes each
block as ~10 separate kernels over micro tensors — heavily
launch/bandwidth-bound (~1% MXU).  This kernel chains the whole stack in a
single pallas_call: the activation stays resident in VMEM across blocks
(grid over blocks, output revisited each step) while each block's weights
stream through the pipeline.

Math matches ``models.nafnet.NAFBlock`` exactly (LayerNorm f32 stats,
time scale/shift, 1x1 expand -> 3x3 depthwise -> SimpleGate -> SCA -> 1x1,
SimpleGate FFN, beta/gamma residual scales).  Time modulation (the per-block
Dense on the time embedding) is computed outside and passed stacked.

Inference-oriented (custom VJP backs off to the jnp composition).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..kernel_gate import target_is_tpu
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_math(x, w, eps):
    """One NAFBlock on x (B, H, W, C) given this block's weight dict."""
    C = x.shape[-1]
    shift_att, scale_att, shift_ffn, scale_ffn = [
        t[:, None, None, :] for t in jnp.split(w["tmod"], 4, axis=-1)
    ]

    def norm(z, g):
        zf = z.astype(jnp.float32)
        mean = jnp.mean(zf, axis=-1, keepdims=True)
        var = jnp.mean(zf * zf, axis=-1, keepdims=True) - mean * mean
        return (zf - mean) * jax.lax.rsqrt(var + eps) * g

    inp = x.astype(jnp.float32)
    h = norm(x, w["g1"]) * (scale_att + 1.0) + shift_att
    h = (
        jnp.einsum("bhwc,cd->bhwd", h, w["w1"], preferred_element_type=jnp.float32)
        + w["b1"]
    )
    # 3x3 depthwise via shifted adds (zero padding)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    acc = jnp.zeros_like(h)
    for dh in range(3):
        for dw_ in range(3):
            acc = acc + hp[:, dh : dh + H, dw_ : dw_ + W, :] * w["wdw"][dh, dw_]
    h = acc + w["b2"]
    h1, h2 = jnp.split(h, 2, axis=-1)
    h = h1 * h2  # SimpleGate
    pooled = jnp.mean(h, axis=(1, 2), keepdims=True)
    sca = (
        jnp.einsum("bhwc,cd->bhwd", pooled, w["wsca"], preferred_element_type=jnp.float32)
        + w["bsca"]
    )
    h = h * sca
    h = (
        jnp.einsum("bhwc,cd->bhwd", h, w["w3"], preferred_element_type=jnp.float32)
        + w["b3"]
    )
    y = inp + h * w["beta"]

    h = norm(y, w["g2"]) * (scale_ffn + 1.0) + shift_ffn
    h = (
        jnp.einsum("bhwc,cd->bhwd", h, w["w4"], preferred_element_type=jnp.float32)
        + w["b4"]
    )
    h1, h2 = jnp.split(h, 2, axis=-1)
    h = h1 * h2
    h = (
        jnp.einsum("bhwc,cd->bhwd", h, w["w5"], preferred_element_type=jnp.float32)
        + w["b5"]
    )
    return y + h * w["gamma"]


_WEIGHT_KEYS = (
    "w1", "b1", "wdw", "b2", "wsca", "bsca", "w3", "b3",
    "w4", "b4", "w5", "b5", "g1", "g2", "beta", "gamma", "tmod",
)


def _jnp_naf_stack(x, stacked: Dict[str, jnp.ndarray], eps: float):
    """Reference composition: K sequential blocks via lax.scan-free loop."""
    K = stacked["w1"].shape[0]
    for i in range(K):
        w = {k: stacked[k][i] for k in _WEIGHT_KEYS}
        x = _block_math(x, w, eps).astype(x.dtype)
    return x


def _kernel(*refs, eps):
    # refs: x_ref, then one ref per weight (blocked over the leading K axis,
    # tmod also over batch), then out_ref.  Grid is (batch_chunks, K) with K
    # innermost: the activation block stays VMEM-resident across the K steps
    # of one batch chunk while weights stream through the pipeline.
    x_ref = refs[0]
    out_ref = refs[-1]
    wrefs = refs[1:-1]
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        out_ref[:] = x_ref[:]

    w = {k: r[0] for k, r in zip(_WEIGHT_KEYS, wrefs)}
    out_ref[:] = _block_math(out_ref[:], w, eps).astype(out_ref.dtype)


# Per-chunk VMEM budget for the f32 activation block (the block math peaks
# at ~6x this in intermediates; 96 MiB vmem_limit leaves ample headroom).
_CHUNK_VMEM_BYTES = int(os.environ.get("IRSDE_NAF_FUSE_CHUNK_BYTES", str(2**21)))


def batch_chunk(x_shape) -> int:
    """Largest divisor of B whose f32 activation block fits the VMEM budget
    (0 if even a single sample does not fit)."""
    B = x_shape[0]
    per_sample = int(np.prod(x_shape[1:])) * 4
    if per_sample > _CHUNK_VMEM_BYTES:
        return 0
    bc = max(c for c in range(1, B + 1) if B % c == 0 and c * per_sample <= _CHUNK_VMEM_BYTES)
    return bc


def _pallas_naf_stack(x, stacked, eps, interpret=False):
    K = stacked["w1"].shape[0]
    B = x.shape[0]
    bc = batch_chunk(x.shape)
    assert bc >= 1, "caller must gate on batch_chunk(x.shape) >= 1"
    grid = (B // bc, K)
    x_spec = pl.BlockSpec(
        (bc,) + x.shape[1:], lambda b, k: (b,) + (0,) * (x.ndim - 1), memory_space=pltpu.VMEM
    )

    nb = B // bc
    in_specs = [x_spec]
    ins = [x]
    for name in _WEIGHT_KEYS:
        arr = stacked[name]
        if name == "tmod":  # (K, B, 4C): per-block AND per-batch-chunk.
            # Mosaic requires the sublane block dim to divide 8 or equal the
            # array dim; reshape so each (block, chunk) pair is a full
            # (bc, 4C) leading slice.
            arr = arr.reshape(K * nb, bc, arr.shape[2])
            blk = (1, bc, arr.shape[2])
            index = lambda b, k, _nb=nb: (k * _nb + b, 0, 0)
        else:
            blk = (1,) + arr.shape[1:]
            index = lambda b, k, _nd=arr.ndim: (k,) + (0,) * (_nd - 1)
        in_specs.append(pl.BlockSpec(blk, index, memory_space=pltpu.VMEM))
        ins.append(arr)

    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(*ins)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def naf_stack(x, stacked, eps: float = 1e-5, use_pallas: bool = True, interpret: bool = False):
    """Run K fused NAFBlocks.  x: (B,H,W,C); stacked: dict of (K, ...) arrays."""
    return _forward(x, stacked, eps, use_pallas, interpret)


def _forward(x, stacked, eps, use_pallas, interpret):
    on_tpu = target_is_tpu()  # real backend, or a force_pallas() export trace
    if use_pallas and (on_tpu or interpret):
        return _pallas_naf_stack(x, stacked, eps, interpret=interpret)
    return _jnp_naf_stack(x, stacked, eps)


def _fwd(x, stacked, eps, use_pallas, interpret):
    return _forward(x, stacked, eps, use_pallas, interpret), (x, stacked)


def _bwd(eps, use_pallas, interpret, res, g):
    x, stacked = res
    _, vjp = jax.vjp(lambda x_, s_: _jnp_naf_stack(x_, s_, eps), x, stacked)
    return vjp(g)


naf_stack.defvjp(_fwd, _bwd)


def stack_middle_params(params, temb, n_blocks: int, prefix: str = "mid_block"):
    """Convert standard ConditionalNAFNet mid-block params (+ a concrete
    time embedding (B, time_dim)) into the stacked kernel layout.

    The per-block time Dense is applied here (host of the fused stack), so
    ``tmod`` is (K, B, 4C).
    """
    p = params["params"] if "params" in params else params
    out = {k: [] for k in _WEIGHT_KEYS}
    for i in range(n_blocks):
        blk = p[f"{prefix}{i}"]
        sq = lambda a: jnp.squeeze(jnp.asarray(a), axis=(0, 1))  # (1,1,C,D)->(C,D)
        out["w1"].append(sq(blk["conv1"]["kernel"]))
        out["b1"].append(blk["conv1"]["bias"])
        out["wdw"].append(jnp.squeeze(blk["conv2"]["kernel"], axis=2))  # (3,3,1,D)->(3,3,D)
        out["b2"].append(blk["conv2"]["bias"])
        out["wsca"].append(sq(blk["sca_conv"]["kernel"]))
        out["bsca"].append(blk["sca_conv"]["bias"])
        out["w3"].append(sq(blk["conv3"]["kernel"]))
        out["b3"].append(blk["conv3"]["bias"])
        out["w4"].append(sq(blk["conv4"]["kernel"]))
        out["b4"].append(blk["conv4"]["bias"])
        out["w5"].append(sq(blk["conv5"]["kernel"]))
        out["b5"].append(blk["conv5"]["bias"])
        out["g1"].append(blk["norm1"]["g"])
        out["g2"].append(blk["norm2"]["g"])
        out["beta"].append(blk["beta"])
        out["gamma"].append(blk["gamma"])
        # time modulation: SimpleGate(temb) -> Dense
        t1, t2 = jnp.split(temb, 2, axis=-1)
        tg = t1 * t2
        tmod = tg @ blk["Dense_0"]["kernel"] + blk["Dense_0"]["bias"]
        out["tmod"].append(tmod)
    stacked = {k: jnp.stack(v) for k, v in out.items()}
    # Mosaic block shapes need the last two dims equal to the array's:
    # lift rank-2 (K, D) stacks to (K, 1, D)
    for k, v in stacked.items():
        if v.ndim == 2:
            stacked[k] = v[:, None, :]
    return stacked
