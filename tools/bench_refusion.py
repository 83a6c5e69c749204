#!/usr/bin/env python
"""Refusion latent-pipeline benchmark: full restoration of 1024x1024 images
(the NTIRE HR-dehazing configuration — compressor encode, 100-step reverse
SDE on 8-ch 1/8-res latents with ConditionalNAFNet w64 [1,1,1,28], decode
with LQ skips). The 1/8 ratio matches the reference: its count_flops.py
feeds a 750x500 latent for 6000x4000 images. Prints one JSON line."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import jax.numpy as jnp

from image_restoration_sde_tpu.models.latent_unet import UNet
from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training.latent import make_latent_sampler


def _peak_hbm_gb():
    """Device-reported peak memory, if the backend exposes it."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 2**30, 2) if peak else None
    except Exception:  # noqa: BLE001 — stats are best-effort decoration
        return None


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    # 4K-class mode: BENCH_H x BENCH_W full image (e.g. the reference's
    # headline 6000x4000 dehazing scale, ref count_flops.py), restored
    # either whole (BENCH_TILE unset; image padded to a /512 bucket so the
    # latent stays compressor+score-net compatible) or via overlapping
    # feathered tiles of BENCH_TILE px (tiling.tiled_restore)
    full_h = int(os.environ.get("BENCH_H", "0"))
    full_w = int(os.environ.get("BENCH_W", "0"))
    tile = int(os.environ.get("BENCH_TILE", "0"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    arch = os.environ.get("BENCH_ARCH", "nafnet")  # nafnet | dit

    sde = IRSDE.create(max_sigma=50.0, T=steps, schedule="cosine", eps=0.005)
    compressor = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(4, 8, 8, 16), embed_dim=8,
                      dtype=jnp.bfloat16)
    if arch == "dit":
        # the latent-dehazing DiT alternative backbone
        # (configs/latent-dehazing/train/dit.yml: DiT_L_2, in_channels 8)
        from image_restoration_sde_tpu.models.dit import DiT_L_2

        score = DiT_L_2(in_channels=8, dtype=jnp.bfloat16)
        label = "DiT-L/2"
    else:
        score = ConditionalNAFNet(
            img_channel=8, width=64, middle_blk_num=1,
            enc_blk_nums=(1, 1, 1, 28), dec_blk_nums=(1, 1, 1, 1), dtype=jnp.bfloat16,
        )
        label = "NAFNet w64"

    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    # init at batch 1: params are batch-independent, and a whole-batch init
    # forward at 1024px would OOM before the (chunked) sampler ever runs
    lat_params = jax.jit(compressor.init)(key, lq[:1])
    lat_dummy = jnp.zeros((1, size // 8, size // 8, 8), jnp.float32)
    params = jax.jit(score.init)(key, lat_dummy, lat_dummy, jnp.zeros((1,)))

    def encode_fn(p, x):
        return compressor.apply(p, x, method=compressor.encode)

    def decode_fn(p, l, h):
        return compressor.apply(p, l, h, method=compressor.decode)

    sampler = make_latent_sampler(
        sde, score.apply, encode_fn, decode_fn, lat_params, mode="sde",
        # score net is bf16-compute; halve its per-step HBM reads
        cast_params=None if os.environ.get("BENCH_NO_CAST") else jnp.bfloat16,
    )

    if full_h and full_w:
        return bench_4k(sampler, params, full_h, full_w, tile, steps, reps, label)

    # warm up the EXACT timed path (incl. fold_in's own first-call compile)
    for i in (1_000_001, 1_000_002):
        out = sampler(params, lq, jax.random.fold_in(key, i))
        out.block_until_ready()
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sampler(params, lq, jax.random.fold_in(key, i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "metric": f"Refusion latent restoration images/sec/chip ({size}px, {steps}-step latent SDE, {label})",
        "value": round(batch / med, 4),
        "unit": "img/s/chip",
        "sec_per_image": round(med / batch, 3),
        "rep_spread": [round(t, 3) for t in times],
    }))


def bench_4k(sampler, params, full_h, full_w, tile, steps, reps, label):
    """One 4K-class image through the latent pipeline: whole-image (padded
    to a /512 bucket: compressor /8 then score-net /8 must both divide) or
    feathered tiles (tiling.tiled_restore at BENCH_TILE px)."""
    import numpy as np

    from image_restoration_sde_tpu.tiling import tiled_restore

    key = jax.random.PRNGKey(1)
    lq = np.asarray(
        jax.random.uniform(key, (1, full_h, full_w, 3), jnp.float32)
    )

    if tile:
        tile_batch = int(os.environ.get("BENCH_TILE_BATCH", "8"))
        overlap = int(os.environ.get("BENCH_TILE_OVERLAP", "64"))
        if os.environ.get("BENCH_TILE_HOST"):
            # host tiler: one device round-trip per tile batch (~700 MB of
            # link traffic per 6000x4000 image — dominates on thin links)
            run = lambda k: tiled_restore(
                sampler, params, lq, k, tile=tile, overlap=overlap,
                tile_batch=tile_batch,
            )
            mode = f"tiled-host {tile}px/b{tile_batch}"
        else:
            from image_restoration_sde_tpu.tiling import tiled_restore_device

            lq8 = np.round(np.clip(lq, 0.0, 1.0) * 255.0).astype(np.uint8)
            run = lambda k: tiled_restore_device(
                sampler, params, lq8, k, tile=tile, overlap=overlap,
                tile_batch=tile_batch,
            )
            mode = f"tiled-device {tile}px/b{tile_batch}"
    else:
        mult = 512
        ph = (mult - full_h % mult) % mult
        pw = (mult - full_w % mult) % mult
        padded = jnp.asarray(
            np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        )
        run = lambda k: np.asarray(sampler(params, padded, k))[:, :full_h, :full_w]
        mode = "whole-image"

    run(jax.random.fold_in(key, 1_000_001))  # compile + warm

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        from image_restoration_sde_tpu.utils import profiling

        with profiling.trace(trace_dir):
            run(jax.random.fold_in(key, 1_000_002))
        print(f"# trace: python tools/trace_summary.py {trace_dir}", file=sys.stderr)

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(jax.random.fold_in(key, i))
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(json.dumps({
        "metric": f"Refusion {full_h}x{full_w} restoration ({mode}, "
                  f"{steps}-step latent SDE, {label})",
        "value": round(med, 2),
        "unit": "s/image",
        "rep_spread": [round(t, 2) for t in times],
        "peak_hbm_gb": _peak_hbm_gb(),
    }))


if __name__ == "__main__":
    main()
