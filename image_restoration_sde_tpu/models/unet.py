"""ConditionalUNet score network (Flax, NHWC).

Functional parity with the reference diffusion U-Net
(``codes/config/deraining/models/modules/DenoisingUNet_arch.py:19-134``):
input is ``concat([x_t - cond, cond])`` (residual conditioning trick),
sinusoidal time embedding -> 2-layer MLP, ``depth`` levels of
2x(ResBlock + time scale/shift) + linear attention with stride-2 downsamples
(the deepest level keeps resolution), a middle block with attention, skip
concatenation of two features per level on the way up, and a final ResBlock
over the concatenated stem features.  Inputs are reflect-padded to a multiple
of 2^depth and cropped back (static under jit).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .modules import (
    Attention,
    ChannelLayerNorm,
    Downsample,
    LinearAttention,
    PreNormResidual,
    RandomOrLearnedSinusoidalPosEmb,
    ResBlock,
    Upsample,
    check_image_size,
    conv,
    sinusoidal_pos_emb,
)


class ConditionalUNet(nn.Module):
    """Args mirror the reference ctor (in_nc, out_nc, nf, depth, upscale)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    depth: int = 4
    upscale: int = 1  # kept for config parity; unused (ref: arch.py:23)
    conditional: bool = True  # False = denoising-sde variant: forward(x, t),
    # no LQ concat (ref config/denoising-sde/models/modules/DenoisingUNet_arch.py:84-95)
    # learned/random Fourier time features (ref arch.py:32-40; default off)
    random_or_learned_sinusoidal_cond: bool = False
    learned_sinusoidal_dim: int = 16
    random_fourier_features: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt: jnp.ndarray, cond: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = xt.shape
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1), (B,))

        if self.conditional:
            x = jnp.concatenate([xt - cond, cond], axis=-1)
        else:
            x = xt
        x = check_image_size(x, 2**self.depth, mode="reflect")
        x = x.astype(self.dtype)

        x = conv(self.nf, 7, dtype=self.dtype, name="init_conv")(x)
        stem = x

        # time MLP: sinusoidal(nf) -> Dense(4nf) -> GELU -> Dense(4nf)
        time_dim = self.nf * 4
        if self.random_or_learned_sinusoidal_cond:
            t = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)  # dim + 1 features (raw t prepended)
        else:
            t = sinusoidal_pos_emb(time, self.nf)
        t = nn.Dense(time_dim, param_dtype=jnp.float32, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)  # torch nn.GELU() is exact erf
        t = nn.Dense(time_dim, param_dtype=jnp.float32, name="time_mlp_2")(t)

        skips = []
        for i in range(self.depth):
            dim_in = self.nf * (2**i)
            dim_out = self.nf * (2 ** (i + 1))
            x = ResBlock(dim_in, dtype=self.dtype, name=f"down{i}_block1")(x, t)
            skips.append(x)
            x = ResBlock(dim_in, dtype=self.dtype, name=f"down{i}_block2")(x, t)
            x = PreNormResidual(
                dim_in,
                LinearAttention(dim_in, dtype=self.dtype, name=f"down{i}_attn"),
                dtype=self.dtype,
                name=f"down{i}_attn_wrap",
            )(x)
            skips.append(x)
            if i != self.depth - 1:
                x = Downsample(dim_out, dtype=self.dtype, name=f"down{i}_down")(x)
            else:
                x = conv(dim_out, 3, dtype=self.dtype, name=f"down{i}_down")(x)

        mid_dim = self.nf * (2**self.depth)
        x = ResBlock(mid_dim, dtype=self.dtype, name="mid_block1")(x, t)
        # conditional variant: linear attention in the mid block (deraining
        # arch.py:72); unconditional denoising-sde variant: FULL spatial
        # attention (denoising-sde/.../DenoisingUNet_arch.py:71)
        mid_attn_cls = LinearAttention if self.conditional else Attention
        x = PreNormResidual(
            mid_dim,
            mid_attn_cls(mid_dim, dtype=self.dtype, name="mid_attn"),
            dtype=self.dtype,
            name="mid_attn_wrap",
        )(x)
        x = ResBlock(mid_dim, dtype=self.dtype, name="mid_block2")(x, t)

        for i in reversed(range(self.depth)):
            dim_in = self.nf * (2**i)
            dim_out = self.nf * (2 ** (i + 1))
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResBlock(dim_out, dtype=self.dtype, name=f"up{i}_block1")(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResBlock(dim_out, dtype=self.dtype, name=f"up{i}_block2")(x, t)
            x = PreNormResidual(
                dim_out,
                LinearAttention(dim_out, dtype=self.dtype, name=f"up{i}_attn"),
                dtype=self.dtype,
                name=f"up{i}_attn_wrap",
            )(x)
            if i != 0:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up{i}_up")(x)
            else:
                x = conv(dim_in, 3, dtype=self.dtype, name=f"up{i}_up")(x)

        x = jnp.concatenate([x, stem], axis=-1)
        x = ResBlock(self.nf, dtype=self.dtype, name="final_res_block")(x, t)
        x = nn.Conv(
            self.out_nc,
            (3, 3),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="final_conv",
        )(x)

        return x[:, :H, :W, :].astype(jnp.float32)
