"""Stereo ConditionalNAFNet with SCAM cross-attention (Flax, NHWC).

Functional parity with the stereo-sr variant
(``codes/config/stereo-sr/models/modules/DenoisingNAFNet_arch.py``):
6-channel stereo input split into L/R and processed as a doubled batch;
every NAFBlock ends with a Stereo Cross Attention Module — L<->R attention
over the width dimension at 1/4 scale (cubic down, nearest up), with
zero-init beta/gamma scales; outputs re-concatenated channel-wise.

The 1/4 downsample inside SCAM matches torch ``F.interpolate`` bicubic
exactly: a trace-time (out, in) weight matrix per axis (Keys a=-0.75,
border-clamped — ``modules.bicubic_resize_weights``) applied as two small
einsum matmuls, which also maps better onto the MXU than a gather-based
resize.  The resize back up is nearest, like torch's default interpolate.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import (
    ChannelLayerNorm,
    bicubic_resize_weights,
    check_image_size,
    pixel_shuffle,
    simple_gate,
    sinusoidal_pos_emb,
)
from .nafnet import NAFBlock, _conv


class SCAM(nn.Module):
    """Stereo Cross Attention Module (ref stereo arch :15-60)."""

    c: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B2, H, W, C = x.shape
        B = B2 // 2
        x_l, x_r = x[:B], x[B:]
        hs, ws = max(H // 4, 1), max(W // 4, 1)
        # torch F.interpolate(scale_factor=0.25, mode='bicubic') parity:
        # trace-time a=-0.75 weight matrices, applied as matmuls
        wh = jnp.asarray(bicubic_resize_weights(H, hs))
        ww = jnp.asarray(bicubic_resize_weights(W, ws))
        down = lambda z: jnp.einsum(
            "oh,pw,bhwc->bopc", wh, ww, z.astype(jnp.float32)
        ).astype(z.dtype)
        x_ls = down(x_l)
        x_rs = down(x_r)

        q_l = _conv(C, 1, "l_proj1", dtype=self.dtype)(
            ChannelLayerNorm(C, dtype=self.dtype, name="norm_l")(x_ls)
        )
        q_r = _conv(C, 1, "r_proj1", dtype=self.dtype)(
            ChannelLayerNorm(C, dtype=self.dtype, name="norm_r")(x_rs)
        )
        v_l = _conv(C, 1, "l_proj2", dtype=self.dtype)(x_ls)
        v_r = _conv(C, 1, "r_proj2", dtype=self.dtype)(x_rs)

        scale = C ** -0.5
        # per-row attention over width: (B,H,W,c) x (B,H,V,c) -> (B,H,W,V)
        attn = jnp.einsum("bhwc,bhvc->bhwv", q_l.astype(jnp.float32), q_r.astype(jnp.float32)) * scale
        f_r2l = jnp.einsum("bhwv,bhvc->bhwc", jax.nn.softmax(attn, axis=-1), v_r.astype(jnp.float32))
        f_l2r = jnp.einsum("bhwv,bhwc->bhvc", jax.nn.softmax(attn, axis=-2), v_l.astype(jnp.float32))

        beta = self.param("beta", nn.initializers.zeros, (C,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (C,), jnp.float32)
        f_r2l = (f_r2l * beta).astype(x.dtype)
        f_l2r = (f_l2r * gamma).astype(x.dtype)

        # nearest resize back to full res (torch F.interpolate default)
        f_r2l = jax.image.resize(f_r2l, (B, H, W, C), method="nearest")
        f_l2r = jax.image.resize(f_l2r, (B, H, W, C), method="nearest")
        return jnp.concatenate([x_l + f_r2l, x_r + f_l2r], axis=0)


class StereoNAFBlock(nn.Module):
    """NAFBlock + SCAM fusion (ref stereo arch :63-136)."""

    c: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        x = NAFBlock(self.c, dtype=self.dtype, name="block")(x, temb)
        return SCAM(self.c, dtype=self.dtype, name="fusion")(x)


class StereoConditionalNAFNet(nn.Module):
    """Args mirror the reference ctor (stereo arch :141)."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    upscale: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp: jnp.ndarray, cond: jnp.ndarray, time) -> jnp.ndarray:
        B, H, W, C6 = inp.shape
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1), (B,))
        dtype = self.dtype
        c3 = C6 // 2

        # split stereo channels, residual conditioning, doubled batch
        xtl, xtr = inp[..., :c3], inp[..., c3:]
        cl, cr = cond[..., :c3], cond[..., c3:]
        xl = jnp.concatenate([xtl - cl, cl], axis=-1)
        xr = jnp.concatenate([xtr - cr, cr], axis=-1)
        x = jnp.concatenate([xl, xr], axis=0)
        time2 = jnp.concatenate([time, time], axis=0)

        time_dim = self.width * 4
        t = sinusoidal_pos_emb(time2, self.width)
        t = nn.Dense(time_dim * 2, param_dtype=jnp.float32, name="time_mlp_1")(t)
        t = simple_gate(t)
        t = nn.Dense(time_dim, param_dtype=jnp.float32, name="time_mlp_2")(t)

        x = check_image_size(x, 2 ** len(self.enc_blk_nums), mode="zeros").astype(dtype)
        x = _conv(self.width, 3, "intro", dtype=dtype)(x)

        skips = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            for b in range(num):
                x = StereoNAFBlock(chan, dtype=dtype, name=f"enc{i}_block{b}")(x, t)
            skips.append(x)
            x = _conv(2 * chan, 2, f"down{i}", stride=2, dtype=dtype)(x)
            chan *= 2

        for b in range(self.middle_blk_num):
            x = StereoNAFBlock(chan, dtype=dtype, name=f"mid_block{b}")(x, t)

        for i, num in enumerate(self.dec_blk_nums):
            x = _conv(2 * chan, 1, f"up{i}", use_bias=False, dtype=dtype)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(i + 1)]
            for b in range(num):
                x = StereoNAFBlock(chan, dtype=dtype, name=f"dec{i}_block{b}")(x, t)

        x = _conv(c3, 3, "ending", dtype=dtype)(x)
        x = x[:, :H, :W, :]
        return jnp.concatenate([x[:B], x[B:]], axis=-1).astype(jnp.float32)
