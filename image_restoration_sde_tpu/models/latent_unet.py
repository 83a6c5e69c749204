"""Refusion latent compressor UNet (Flax, NHWC).

Functional parity with the reference asymmetric-skip autoencoder
(``codes/config/unet-latent/models/modules/UNet_arch.py:17-97``):
``encode`` saves two skip features per level plus the stem; the latent is a
1x1-conv projection to ``embed_dim`` channels at 1/2^depth resolution;
``decode`` re-consumes the skips (which carry the HQ detail) and adds the
stem before the final conv.  Attention only at the deepest level; no time
conditioning.

Use with ``net.apply(params, x, method=net.encode)`` etc.  ``decode`` crops
to ``hw`` (the pre-padding size) when given.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .modules import (
    Downsample,
    LinearAttention,
    PreNormResidual,
    ResBlock,
    Upsample,
    check_image_size,
    conv,
)


class UNet(nn.Module):
    """Args mirror the reference ctor (UNet_arch.py:18)."""

    in_ch: int = 3
    out_ch: int = 3
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    embed_dim: int = 4
    dtype: Any = jnp.float32

    @property
    def depth(self) -> int:
        return len(self.ch_mult)

    def setup(self):
        d = self.dtype
        mult = [1] + list(self.ch_mult)
        self.init_conv = conv(self.ch, 3, dtype=d, name="init_conv")
        enc, dec = [], []
        for i in range(self.depth):
            dim_in = self.ch * mult[i]
            dim_out = self.ch * mult[i + 1]
            last = i == self.depth - 1
            enc.append(
                dict(
                    b1=ResBlock(dim_in, time_emb=False, dtype=d, name=f"enc{i}_block1"),
                    b2=ResBlock(dim_in, time_emb=False, dtype=d, name=f"enc{i}_block2"),
                    attn=PreNormResidual(
                        dim_in, LinearAttention(dim_in, dtype=d, name=f"enc{i}_attn"),
                        dtype=d, name=f"enc{i}_attn_wrap",
                    ) if last else None,
                    down=(
                        conv(dim_out, 3, dtype=d, name=f"enc{i}_down")
                        if last
                        else Downsample(dim_out, dtype=d, name=f"enc{i}_down")
                    ),
                )
            )
            dec.append(
                dict(
                    b1=ResBlock(dim_out, time_emb=False, dtype=d, name=f"dec{i}_block1"),
                    b2=ResBlock(dim_out, time_emb=False, dtype=d, name=f"dec{i}_block2"),
                    attn=PreNormResidual(
                        dim_out, LinearAttention(dim_out, dtype=d, name=f"dec{i}_attn"),
                        dtype=d, name=f"dec{i}_attn_wrap",
                    ) if last else None,
                    up=(
                        conv(dim_in, 3, dtype=d, name=f"dec{i}_up")
                        if i == 0
                        else Upsample(dim_in, dtype=d, name=f"dec{i}_up")
                    ),
                )
            )
        self.enc_levels = enc
        self.dec_levels = dec
        mid_dim = self.ch * mult[-1]
        self.latent_conv = conv(self.embed_dim, 1, dtype=d, name="latent_conv")
        self.post_latent_conv = conv(mid_dim, 1, dtype=d, name="post_latent_conv")
        self.final_conv = nn.Conv(
            self.out_ch, (3, 3), padding="SAME", use_bias=True,
            dtype=d, param_dtype=jnp.float32, name="final_conv",
        )

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        x = check_image_size(x, 2**self.depth, mode="reflect").astype(self.dtype)
        x = self.init_conv(x)
        hs = [x]
        for lvl in self.enc_levels:
            x = lvl["b1"](x)
            hs.append(x)
            x = lvl["b2"](x)
            if lvl["attn"] is not None:
                x = lvl["attn"](x)
            hs.append(x)
            x = lvl["down"](x)
        latent = self.latent_conv(x)
        return latent, hs

    def decode(
        self,
        latent: jnp.ndarray,
        hs: List[jnp.ndarray],
        hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        x = self.post_latent_conv(latent.astype(self.dtype))
        for k, i in enumerate(reversed(range(self.depth))):  # deepest first
            lvl = self.dec_levels[i]
            x = jnp.concatenate([x, hs[-(k * 2 + 1)]], axis=-1)
            x = lvl["b1"](x)
            x = jnp.concatenate([x, hs[-(k * 2 + 2)]], axis=-1)
            x = lvl["b2"](x)
            if lvl["attn"] is not None:
                x = lvl["attn"](x)
            x = lvl["up"](x)
        x = self.final_conv(x + hs[0])
        if hw is not None:
            x = x[:, : hw[0], : hw[1], :]
        return x.astype(jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = x.shape[1:3]
        latent, hs = self.encode(x)
        return self.decode(latent, hs, (H, W))
