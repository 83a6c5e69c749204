"""Bokeh ConditionalNAFNet: lens-metadata conditioning (Flax, NHWC).

Functional parity with the latent-bokeh variant
(``codes/config/latent-bokeh/models/modules/DenoisingNAFNet_arch.py``):
src/tgt lens values and disparity are each sinusoidally embedded,
concatenated through a SimpleGate ``cam_mlp``, and every NAFBlock applies an
extra (scale, shift) from the camera embedding on the FFN branch between
SimpleGate and the projection conv.

Call signature: ``net.apply(params, x, cond, t, lens_info=(src, tgt, disp))``
with each lens component shaped ``(B,)`` — flows through the SDE samplers'
``**kwargs`` path like the reference (sde_utils.py:187-194).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .modules import ChannelLayerNorm, check_image_size, pixel_shuffle, simple_gate, sinusoidal_pos_emb
from .nafnet import _conv


class BokehNAFBlock(nn.Module):
    """NAFBlock with time + camera modulation (ref bokeh arch :15-92)."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, camemb):
        c, dtype = self.c, self.dtype
        dw = c * self.dw_expand

        t = simple_gate(temb.astype(dtype))
        t = nn.Dense(c * 4, dtype=dtype, param_dtype=jnp.float32, name="time_mlp")(t)[:, None, None, :]
        t_shift_att, t_scale_att, t_shift_ffn, t_scale_ffn = jnp.split(t, 4, axis=-1)
        cam = simple_gate(camemb.astype(dtype))
        cam = nn.Dense(c * 2, dtype=dtype, param_dtype=jnp.float32, name="cam_mlp")(cam)[:, None, None, :]
        cam_scale, cam_shift = jnp.split(cam, 2, axis=-1)

        inp = x
        x = ChannelLayerNorm(c, dtype=dtype, name="norm1")(x)
        x = x * (t_scale_att + 1.0) + t_shift_att
        x = _conv(dw, 1, "conv1", dtype=dtype)(x)
        x = _conv(dw, 3, "conv2", groups=dw, dtype=dtype)(x)
        x = simple_gate(x)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x * _conv(dw // 2, 1, "sca_conv", dtype=dtype)(pooled)
        x = _conv(c, 1, "conv3", dtype=dtype)(x)

        # f32 params, block-dtype multiply: keeps a bf16 net's residual
        # stream bf16 (see models/nafnet.py NAFBlock)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        y = inp + x * beta.astype(dtype)

        x = ChannelLayerNorm(c, dtype=dtype, name="norm2")(y)
        x = x * (t_scale_ffn + 1.0) + t_shift_ffn
        x = _conv(self.ffn_expand * c, 1, "conv4", dtype=dtype)(x)
        x = simple_gate(x)
        x = x * (cam_scale + 1.0) + cam_shift
        x = _conv(c, 1, "conv5", dtype=dtype)(x)

        gamma = self.param("gamma", nn.initializers.zeros, (c,), jnp.float32)
        return y + x * gamma.astype(dtype)


class BokehConditionalNAFNet(nn.Module):
    """Args mirror the reference ctor (bokeh arch :95)."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    upscale: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp, cond, time, lens_info: Tuple = None):
        B, H, W, _ = inp.shape
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1), (B,))
        dtype = self.dtype
        time_dim = self.width * 4

        t = sinusoidal_pos_emb(time, self.width)
        t = nn.Dense(time_dim * 2, param_dtype=jnp.float32, name="time_mlp_1")(t)
        t = simple_gate(t)
        t = nn.Dense(time_dim, param_dtype=jnp.float32, name="time_mlp_2")(t)

        # lens conditioning: each scalar sinusoidally embedded, concatenated
        embs = [
            sinusoidal_pos_emb(
                jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (B,)), self.width
            )
            for v in lens_info
        ]
        cam = jnp.concatenate(embs, axis=-1)
        cam = nn.Dense(time_dim * 2, param_dtype=jnp.float32, name="cam_mlp_1")(cam)
        cam = simple_gate(cam)
        cam = nn.Dense(time_dim, param_dtype=jnp.float32, name="cam_mlp_2")(cam)

        x = jnp.concatenate([inp - cond, cond], axis=-1)
        x = check_image_size(x, 2 ** len(self.enc_blk_nums), mode="zeros").astype(dtype)
        x = _conv(self.width, 3, "intro", dtype=dtype)(x)

        skips = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            for b in range(num):
                x = BokehNAFBlock(chan, dtype=dtype, name=f"enc{i}_block{b}")(x, t, cam)
            skips.append(x)
            x = _conv(2 * chan, 2, f"down{i}", stride=2, dtype=dtype)(x)
            chan *= 2

        for b in range(self.middle_blk_num):
            x = BokehNAFBlock(chan, dtype=dtype, name=f"mid_block{b}")(x, t, cam)

        for i, num in enumerate(self.dec_blk_nums):
            x = _conv(2 * chan, 1, f"up{i}", use_bias=False, dtype=dtype)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(i + 1)]
            for b in range(num):
                x = BokehNAFBlock(chan, dtype=dtype, name=f"dec{i}_block{b}")(x, t, cam)

        x = _conv(self.img_channel, 3, "ending", dtype=dtype)(x)
        return x[:, :H, :W, :].astype(jnp.float32)
