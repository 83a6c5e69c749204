"""ConditionalNAFNet score network (Flax, NHWC) — Refusion's backbone.

Functional parity with the reference
(``codes/config/deraining/models/modules/DenoisingNAFNet_arch.py:15-188``):
NAFBlocks (1x1 expand -> 3x3 depthwise -> SimpleGate -> simplified channel
attention -> 1x1 project, then a SimpleGate FFN; AdaLN-style time
scale/shift on both branches; learned per-channel beta/gamma residual
scales), 2x2 stride-2 conv downsamples, PixelShuffle upsamples with
*additive* skips, and a SimpleGate time MLP.

Module names here (enc{i}_block{b}, down{i}, mid_block{b}, up{i},
dec{i}_block{b}, conv1..conv5, sca_conv, norm1/2) are the contract for the
torch checkpoint importer (utils/torch_import.nafnet_key_rules).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernel_gate import target_is_tpu
from .modules import (
    ChannelLayerNorm,
    check_image_size,
    local_avg_pool,
    pixel_shuffle,
    simple_gate,
    sinusoidal_pos_emb,
    use_pallas,
)

# Runs of >= this many NAFBlocks at one pyramid level are fused into a
# single pallas_call (ops/naf_stack.py) on TPU: the activation stays VMEM
# resident across the whole run while per-block weights stream through the
# pipeline.  The flagship Refusion config (enc [1,1,1,28]) hits this on its
# 28-block deep level.  Opt out with IRSDE_DISABLE_PALLAS=1.
_FUSE_MIN_BLOCKS = 4


def _conv(features, kernel, name, use_bias=True, stride=1, groups=1, dtype=jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME" if stride == 1 else ((0, 0), (0, 0)),
        use_bias=use_bias,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class NAFBlock(nn.Module):
    """Ref: DenoisingNAFNet_arch.py:15-84.

    ``sca_kernel``: when set, the simplified-channel-attention pool becomes a
    TLSC windowed mean (local statistics; ref local_arch.py) instead of the
    global mean — the train/test resolution-mismatch fix.
    """

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    sca_kernel: Any = None  # Optional[Tuple[int, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        c, dtype = self.c, self.dtype
        dw = c * self.dw_expand

        # time modulation: SimpleGate on temb then Dense -> 4 chunks
        t = simple_gate(temb.astype(dtype))
        t = nn.Dense(c * 4, dtype=dtype, param_dtype=jnp.float32)(t)[:, None, None, :]
        shift_att, scale_att, shift_ffn, scale_ffn = jnp.split(t, 4, axis=-1)

        inp = x
        x = ChannelLayerNorm(c, dtype=dtype, name="norm1")(x)
        x = x * (scale_att + 1.0) + shift_att
        x = _conv(dw, 1, "conv1", dtype=dtype)(x)
        x = _conv(dw, 3, "conv2", groups=dw, dtype=dtype)(x)
        x = simple_gate(x)
        # simplified channel attention: (global | TLSC local) pool -> 1x1 conv
        if self.sca_kernel is not None and (
            self.sca_kernel[0] < x.shape[1] or self.sca_kernel[1] < x.shape[2]
        ):
            pooled = local_avg_pool(x, self.sca_kernel[0], self.sca_kernel[1])
        else:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x * _conv(dw // 2, 1, "sca_conv", dtype=dtype)(pooled)
        x = _conv(c, 1, "conv3", dtype=dtype)(x)

        # beta/gamma are f32 PARAMS but multiply in the block dtype: an f32
        # scale would promote the whole residual stream to f32 — for bf16
        # nets that doubles the per-block HBM traffic AND saves every
        # residual twice (bf16+f32) for backward; measured as the top cost
        # of the Refusion latent train step (BENCH.md round 5)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        y = inp + x * beta.astype(dtype)

        x = ChannelLayerNorm(c, dtype=dtype, name="norm2")(y)
        x = x * (scale_ffn + 1.0) + shift_ffn
        x = _conv(self.ffn_expand * c, 1, "conv4", dtype=dtype)(x)
        x = simple_gate(x)
        x = _conv(c, 1, "conv5", dtype=dtype)(x)

        gamma = self.param("gamma", nn.initializers.zeros, (c,), jnp.float32)
        return y + x * gamma.astype(dtype)


class ConditionalNAFNet(nn.Module):
    """Args mirror the reference ctor (DenoisingNAFNet_arch.py:89)."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    upscale: int = 1  # config parity; unused
    conditional: bool = True  # False = denoising-sde variant (no LQ concat)
    tlsc_train_size: Any = None  # (H, W) train crop -> TLSC local SCA stats
    dtype: Any = jnp.float32

    def _sca_kernel(self, level: int):
        """TLSC kernel at a pyramid level: 1.5x the train-crop feature size
        (ref local_arch.py:26-36 — kernels are pinned by a train-size dry
        run; here computed statically per level)."""
        if self.tlsc_train_size is None:
            return None
        th, tw = self.tlsc_train_size
        base_h, base_w = int(th * 1.5), int(tw * 1.5)
        fh, fw = th >> level, tw >> level
        return (max(1, fh * base_h // th), max(1, fw * base_w // tw))

    def _block_run(self, x, t, *, prefix: str, count: int, level: int, chan: int):
        """Run ``count`` NAFBlocks named ``{prefix}{b}``, fusing long runs on
        small feature maps into one pallas_call (ops/naf_stack.py).

        The fused path reads the blocks' (already created) params via
        ``get_variable`` — the param tree and checkpoint/importer contract
        are unchanged.  During ``init`` the blocks always run individually
        so their params exist.  The fused math runs f32 end-to-end (for
        bf16 nets that is a small, strictly-accuracy-improving drift)."""
        sca = self._sca_kernel(level)
        blocks = [
            NAFBlock(chan, sca_kernel=sca, dtype=self.dtype, name=f"{prefix}{b}")
            for b in range(count)
        ]
        interp = os.environ.get("IRSDE_NAF_FUSE_INTERPRET", "0") == "1"  # tests
        from ..ops.naf_stack import batch_chunk

        fuse = (
            count >= _FUSE_MIN_BLOCKS
            and not self.is_initializing()
            and os.environ.get("IRSDE_DISABLE_PALLAS", "0") != "1"
            # batch-1/2 layout poisoning around custom-calls (see
            # modules._PALLAS_MIN_BATCH); interpret mode keeps tests running
            and (use_pallas(x.shape[0]) or interp)
            and (target_is_tpu() or interp)
            # a batch chunk of the activation must fit the kernel's per-chunk
            # VMEM budget (the kernel grids over (batch_chunks, blocks))
            and batch_chunk(x.shape) >= 1
            # TLSC local pooling isn't in the fused kernel; global-mean only
            and (sca is None or (sca[0] >= x.shape[1] and sca[1] >= x.shape[2]))
        )
        if not fuse:
            for blk in blocks:
                x = blk(x, t)
            return x
        from ..ops.naf_stack import naf_stack, stack_middle_params

        p = {f"{prefix}{b}": self.get_variable("params", f"{prefix}{b}") for b in range(count)}
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        stacked = stack_middle_params({"params": p}, t, count, prefix=prefix)
        return naf_stack(x, stacked, eps, True, interp)

    @nn.compact
    def __call__(self, inp: jnp.ndarray, cond: jnp.ndarray, time) -> jnp.ndarray:
        B, H, W, _ = inp.shape
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1), (B,))
        dtype = self.dtype

        # time MLP: sinusoidal(width) -> Dense(8*width) -> SimpleGate -> Dense(4*width)
        time_dim = self.width * 4
        t = sinusoidal_pos_emb(time, self.width)
        t = nn.Dense(time_dim * 2, param_dtype=jnp.float32, name="time_mlp_1")(t)
        t = simple_gate(t)
        t = nn.Dense(time_dim, param_dtype=jnp.float32, name="time_mlp_2")(t)

        if self.conditional:
            x = jnp.concatenate([inp - cond, cond], axis=-1)
        else:
            x = inp
        x = check_image_size(x, 2 ** len(self.enc_blk_nums), mode="zeros")
        x = x.astype(dtype)

        x = _conv(self.width, 3, "intro", dtype=dtype)(x)

        skips = []
        chan = self.width
        for i, num in enumerate(self.enc_blk_nums):
            x = self._block_run(x, t, prefix=f"enc{i}_block", count=num, level=i, chan=chan)
            skips.append(x)
            x = _conv(2 * chan, 2, f"down{i}", stride=2, dtype=dtype)(x)
            chan *= 2

        n_enc = len(self.enc_blk_nums)
        x = self._block_run(x, t, prefix="mid_block", count=self.middle_blk_num,
                            level=n_enc, chan=chan)

        for i, num in enumerate(self.dec_blk_nums):
            x = _conv(2 * chan, 1, f"up{i}", use_bias=False, dtype=dtype)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(i + 1)]
            x = self._block_run(x, t, prefix=f"dec{i}_block", count=num,
                                level=n_enc - 1 - i, chan=chan)

        x = _conv(self.img_channel, 3, "ending", dtype=dtype)(x)
        return x[:, :H, :W, :].astype(jnp.float32)
