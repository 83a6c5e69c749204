"""Shared network building blocks (Flax, NHWC).

Functional parity with the reference module library
(``codes/config/deraining/models/modules/module_util.py``), redesigned for
TPU: NHWC layout so convolutions tile onto the MXU, channel-LayerNorm over
the trailing axis, attention as batched einsums, and a ``dtype`` knob for
bfloat16 compute with float32 parameters (norm statistics and softmax stay
f32 for stability).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Pallas kernels auto-engage on TPU; IRSDE_DISABLE_PALLAS=1 turns them off
_USE_PALLAS = os.environ.get("IRSDE_DISABLE_PALLAS", "0") != "1"

# Measured crossover on the flagship sampler (BENCH.md): the custom kernels
# win from batch 4 up (+53% at batch 8) but LOSE at batch 1-2 — XLA assigns
# non-standard tiled layouts around the custom-calls at tiny batch and the
# relayouts dominate.  Shapes are static under jit, so this is a trace-time
# decision per call site.
_PALLAS_MIN_BATCH = int(os.environ.get("IRSDE_PALLAS_MIN_BATCH", "4"))

# Trace-time kill-/force-switches for AOT export live in kernel_gate (a
# leaf module, because ops/* also consult them); re-exported here for the
# natural import site.
from ..kernel_gate import force_pallas, no_pallas  # noqa: F401
from .. import kernel_gate as _kg


def pallas_forced_off() -> bool:
    """True inside a ``no_pallas()`` block (gates that don't go through
    ``use_pallas`` — e.g. DiT's sequence-length flash gate — consult this)."""
    return _kg.forced_off()


def use_pallas(batch: int, site: Optional[str] = None) -> bool:
    """Trace-time kernel gate.  ``site`` ("ln", "attn", ...) allows
    per-call-site overrides via IRSDE_PALLAS_<SITE>=0/1 for measurement
    (the batch crossover differs per kernel)."""
    # NOTE: force_pallas() (kernel_gate.forced_on) deliberately does NOT
    # bypass this function — it only overrides *backend* checks
    # (target_is_tpu).  The batch>=N crossover below still applies during a
    # kernels=True export trace, so an exported artifact makes the same
    # kernel choices the live TPU sampler would at that batch.
    if _kg.forced_off() or not _USE_PALLAS:
        return False
    if site is not None:
        v = os.environ.get(f"IRSDE_PALLAS_{site.upper()}")
        if v is not None:
            return v == "1"
    return batch >= _PALLAS_MIN_BATCH


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Transformer sinusoidal timestep embedding.

    Ref: module_util.py:29-41 (SinusoidalPosEmb) — half sin, half cos with
    log-spaced frequencies exp(-log(10000) * i / (half-1)).
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Random (or learned) Fourier features on the timestep.

    Ref: module_util.py:44-59.  Output dim is ``dim + 1`` (raw t prepended).
    """

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        assert self.dim % 2 == 0
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,), jnp.float32)
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = jnp.asarray(t, jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """Bias-free LayerNorm over the channel (trailing) axis.

    Ref: module_util.py:70-79 — biased variance, scale-only affine, and a
    dtype-dependent eps (1e-5 for f32 inputs, 1e-3 for half precision).
    Statistics are always computed in float32.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        from ..ops.layernorm import channel_layernorm

        # Stats are computed in f32 INSIDE the op; feeding the native dtype
        # (and writing it back directly) avoids two full-size f32 round
        # trips per norm — bitwise identical to casting outside.
        return channel_layernorm(x, g, eps, use_pallas(x.shape[0], "ln")).astype(self.dtype)


def conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    use_bias: bool = False,
    dtype: Dtype = jnp.float32,
    padding="SAME",
    name: Optional[str] = None,
) -> nn.Conv:
    """3x3-style conv; the reference's ``default_conv`` is bias-free
    (module_util.py:104-105), torch ``nn.Conv2d`` defaults to bias=True."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Downsample(nn.Module):
    """4x4 stride-2 conv (torch padding=1).  Ref: module_util.py:100-101."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.dim_out,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv.  Ref: module_util.py:93-97."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(
            self.dim_out,
            (3, 3),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC depth-to-space (torch PixelShuffle parity).

    torch PixelShuffle on NCHW with C = r^2*c maps channel index (c, rh, rw);
    with NHWC we reshape (..., rh, rw, c) accordingly.
    """
    B, H, W, C = x.shape
    r = factor
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC space-to-depth (inverse of :func:`pixel_shuffle`)."""
    B, H, W, C = x.shape
    r = factor
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H // r, W // r, C * r * r)


class Block(nn.Module):
    """conv -> (optional scale/shift) -> SiLU.  Ref: module_util.py:108-122."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        x = conv(self.dim_out, 3, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResBlock(nn.Module):
    """Two conv blocks with AdaLN-style time scale/shift on the first.

    Ref: module_util.py:125-146.
    """

    dim_out: int
    time_emb: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb: Optional[jnp.ndarray] = None):
        scale_shift = None
        if self.time_emb and time_emb is not None:
            t = nn.silu(time_emb.astype(self.dtype))
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32)(t)
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(self.dim_out, dtype=self.dtype)(x, scale_shift=scale_shift)
        h = Block(self.dim_out, dtype=self.dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = conv(self.dim_out, 1, dtype=self.dtype)(x)
        return h + x


class LinearAttention(nn.Module):
    """Efficient channel ("linear") attention.

    Ref: module_util.py:150-178 — softmax(q) over the head-channel axis,
    softmax(k) over the spatial axis, context = k v^T reduced over space,
    out = context^T q; 1x1-conv projections, LayerNorm on the output.
    The einsums are MXU-friendly batched matmuls; softmax runs in f32.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        N = H * W
        hidden = self.heads * self.dim_head
        qkv = conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)

        from ..ops.linear_attention import linear_attention_packed

        # The conv's (B, H, W, 3*h*d) output IS the kernel's packed layout —
        # no transposes, no f32 materialization (softmax runs f32 in-kernel).
        out = linear_attention_packed(
            qkv.reshape(B, N, 3 * hidden), self.heads, self.dim_head, use_pallas(B, "attn")
        )
        out = out.reshape(B, H, W, hidden).astype(self.dtype)

        out = nn.Conv(
            self.dim, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32
        )(out)
        return ChannelLayerNorm(self.dim, dtype=self.dtype)(out)


class Attention(nn.Module):
    """Full spatial self-attention.  Ref: module_util.py:182-204."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        N = H * W
        hidden = self.heads * self.dim_head
        qkv = conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        q = q.astype(jnp.float32) * (self.dim_head**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k.astype(jnp.float32))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v.astype(jnp.float32))
        out = out.reshape(B, H, W, hidden).astype(self.dtype)
        return nn.Conv(
            self.dim, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32
        )(out)


class PreNormResidual(nn.Module):
    """x + fn(LayerNorm(x)) — the reference's Residual(PreNorm(...)) pair.

    Ref: module_util.py:20-26, 82-90.
    """

    dim: int
    fn: Callable
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return self.fn(ChannelLayerNorm(self.dim, dtype=self.dtype)(x)) + x


def check_image_size(x: jnp.ndarray, multiple: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad H/W (bottom/right) to a multiple of ``multiple``.

    Ref: DenoisingUNet_arch.py:78-83 (reflect) and
    DenoisingNAFNet_arch.py:183-188 (zeros).  Shapes are static under jit, so
    this is resolved at trace time.
    """
    B, H, W, C = x.shape
    pad_h = (multiple - H % multiple) % multiple
    pad_w = (multiple - W % multiple) % multiple
    if pad_h == 0 and pad_w == 0:
        return x
    pad = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
    return jnp.pad(x, pad, mode=mode if mode != "zeros" else "constant")


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    """Split channels in half and multiply.  Ref: DenoisingNAFNet_arch.py:9-12."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


def bicubic_resize_weights(in_size: int, out_size: int, a: float = -0.75) -> "np.ndarray":
    """Dense ``(out, in)`` interpolation matrix equal to torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` along one axis
    (no antialias; Keys kernel with a=-0.75, indices clamped at borders).

    Shapes are static under jit, so callers bake this at trace time and the
    resize becomes two small matmuls — MXU-friendly and exactly
    torch-matching, unlike ``jax.image.resize``'s a=-0.5 cubic.  Used by
    SCAM's 1/4 downsample (ref stereo-sr DenoisingNAFNet_arch.py:36-37).
    """
    import math

    import numpy as np

    w = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        f = math.floor(src)
        t = src - f
        for off, dist in zip((-1, 0, 1, 2), (t + 1, t, 1 - t, 2 - t)):
            x = abs(dist)
            if x <= 1:
                wk = (a + 2) * x**3 - (a + 3) * x**2 + 1
            elif x < 2:
                wk = a * (x**3 - 5 * x**2 + 8 * x - 4)
            else:
                wk = 0.0
            idx = min(max(f + off, 0), in_size - 1)
            w[i, idx] += wk
    return w


def local_avg_pool(x: jnp.ndarray, k1: int, k2: int) -> jnp.ndarray:
    """TLSC windowed average pooling via integral image, same-size output.

    Exact port of the reference's non-fast AvgPool2d path
    (local_arch.py:57-72): k1 x k2 window sums from a zero-padded 2-D cumsum,
    normalized by the window area, then replicate-padded back to the input's
    spatial dims.  NHWC.
    """
    B, H, W, C = x.shape
    k1, k2 = min(H, k1), min(W, k2)
    s = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=2), axis=1)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    out = (
        s[:, k1:, k2:] + s[:, :-k1, :-k2] - s[:, :-k1, k2:] - s[:, k1:, :-k2]
    ) / (k1 * k2)
    _h, _w = out.shape[1], out.shape[2]
    pad = ((0, 0), ((H - _h) // 2, (H - _h + 1) // 2), ((W - _w) // 2, (W - _w + 1) // 2), (0, 0))
    return jnp.pad(out, pad, mode="edge").astype(x.dtype)


class Upsampler(nn.Module):
    """PixelShuffle upsampling ladder for 2^n / 3x scales.

    Ref: module_util.py:207-234 — conv to r^2*feats then depth-to-space per
    stage (bn/act options omitted: the reference never enables them).
    """

    scale: int
    n_feats: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (self.scale & (self.scale - 1)) == 0:  # power of two
            for _ in range(int(math.log2(self.scale))):
                x = conv(4 * self.n_feats, 3, use_bias=self.use_bias, dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = conv(9 * self.n_feats, 3, use_bias=self.use_bias, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"Upsampler scale {self.scale}")
        return x


def kaiming_normal_init(scale: float = 1.0):
    """Kaiming-normal (fan_in) initializer with a residual-scale multiplier.

    Ref: module_util.py:237-254 (initialize_weights) — offered as an opt-in
    initializer; the reference defines it but the diffusion nets never call
    it, so flax defaults are the effective parity.
    """
    base = nn.initializers.variance_scaling(2.0 * scale * scale, "fan_in", "normal")
    return base


def group_norm(num_channels: int, dtype: Dtype = jnp.float32) -> nn.GroupNorm:
    """32-group GroupNorm (module_util.py:66-67 `Normalize`; defined upstream
    but unused by the shipped architectures — provided for completeness)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32)
