#!/usr/bin/env python
"""Unified evaluation driver.

Parity: ref ``config/<task>/test.py:70-219`` — batch-1 sweep over each test
set, save output/LQ/GT PNGs, report PSNR/SSIM (+Y-channel variants), LPIPS
when the ``lpips`` package is available, and per-image wall time.

CLI parity: python tools/test.py -opt=<yml>
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu.data import create_dataloader, create_dataset
from image_restoration_sde_tpu.data.io_utils import save_img
from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.sampling import make_restoration_sampler, pad_to_bucket, unpad
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training.checkpoint import load_params
from image_restoration_sde_tpu.utils import metrics, options, tensor2img
from image_restoration_sde_tpu.utils.degradations import upscale
from image_restoration_sde_tpu.utils.logging_utils import mkdirs, setup_logger
from image_restoration_sde_tpu.data.transforms import rgb2ycbcr


def try_lpips():
    try:
        import lpips
        import torch

        fn = lpips.LPIPS(net="alex")

        def compute(a_rgb_uint8, b_rgb_uint8):
            def to_t(x):
                t = torch.from_numpy(x.astype(np.float32) / 127.5 - 1.0)
                return t.permute(2, 0, 1)[None]

            with torch.no_grad():
                return float(fn(to_t(a_rgb_uint8), to_t(b_rgb_uint8)))

        return compute
    except Exception:
        return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    args = parser.parse_args()
    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))

    mkdirs([opt["path"]["results_root"], opt["path"]["log"]])
    setup_logger("base", opt["path"]["log"], "test_" + opt["name"], screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(options.dict2str(opt))

    which, setting = options.network_setting(opt)
    net = build_network(which, setting)
    sde_opt = opt["sde"]
    sde = IRSDE.create(
        max_sigma=sde_opt["max_sigma"], T=int(sde_opt["T"]),
        schedule=sde_opt["schedule"], eps=float(sde_opt["eps"]),
    )
    mode = sde_opt["sampling_mode"] or "posterior"
    steps = int(sde_opt["sample_T"]) if sde_opt["sample_T"] else None
    sampler = make_restoration_sampler(sde, net.apply, mode=mode, steps=steps)

    in_nc = int(setting.get("in_nc") or setting.get("img_channel") or 3)
    dummy = jnp.zeros((1, 64, 64, in_nc), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), dummy, dummy, jnp.array([1.0]))
    load_path = opt["path"]["pretrain_model_G"]
    if not load_path:
        raise ValueError("path.pretrain_model_G is required for testing")
    logger.info(f"Loading model [{load_path}]")
    params = load_params(load_path, params)

    lpips_fn = try_lpips()
    key = jax.random.PRNGKey(opt["seed"] or 0)

    for phase, dataset_opt in opt["datasets"].items():
        test_set = create_dataset(dataset_opt)
        test_loader = create_dataloader(test_set, dataset_opt, opt)
        name = dataset_opt["name"]
        logger.info(f"Testing [{name}] : {len(test_set)} images, mode={mode}")
        out_dir = os.path.join(opt["path"]["results_root"], name)
        mkdirs(out_dir)

        sums = dict(psnr=0.0, ssim=0.0, psnr_y=0.0, ssim_y=0.0, lpips=0.0, time=0.0)
        n = 0
        for i, batch in enumerate(test_loader):
            has_gt = "GT" in batch
            lq = batch["LQ"]
            if opt["distortion"] == "sr":
                lq = upscale(lq, int(opt["degradation"]["scale"]))
            base = os.path.splitext(os.path.basename(batch["LQ_path"][0]))[0]

            vlq, hw = pad_to_bucket(lq, 64)
            t0 = time.perf_counter()
            out = unpad(sampler(params, jnp.asarray(vlq), jax.random.fold_in(key, i)), hw)
            out.block_until_ready()
            dt = time.perf_counter() - t0

            out_img = tensor2img(out[0])
            lq_img = tensor2img(lq[0])
            save_img(out_img, os.path.join(out_dir, f"{base}.png"))
            save_img(lq_img, os.path.join(out_dir, f"{base}_LQ.png"))

            if has_gt:
                gt_img = tensor2img(batch["GT"][0])
                save_img(gt_img, os.path.join(out_dir, f"{base}_GT.png"))
                crop = int(opt["crop_border"] or opt["scale"] or 0)
                o, g = out_img, gt_img
                if crop:
                    o, g = o[crop:-crop, crop:-crop], g[crop:-crop, crop:-crop]
                psnr = metrics.calculate_psnr(o, g)
                ssim = metrics.calculate_ssim(o, g)
                oy = rgb2ycbcr(o.astype(np.float64) / 255.0, only_y=True) * 255
                gy = rgb2ycbcr(g.astype(np.float64) / 255.0, only_y=True) * 255
                psnr_y = metrics.calculate_psnr(oy, gy)
                ssim_y = metrics.calculate_ssim(oy, gy)
                lp = lpips_fn(o, g) if lpips_fn else float("nan")
                sums["psnr"] += psnr
                sums["ssim"] += ssim
                sums["psnr_y"] += psnr_y
                sums["ssim_y"] += ssim_y
                sums["lpips"] += 0.0 if np.isnan(lp) else lp
                sums["time"] += dt
                n += 1
                logger.info(
                    f"{i+1:3d} - {base:20s} | PSNR {psnr:.4f} SSIM {ssim:.4f} | "
                    f"PSNR-Y {psnr_y:.4f} SSIM-Y {ssim_y:.4f} | LPIPS {lp:.4f} | {dt:.2f}s"
                )
            else:
                logger.info(f"{i+1:3d} - {base:20s} | (no GT) | {dt:.2f}s")

        if n:
            logger.info(
                f"--- [{name}] avg over {n}: PSNR {sums['psnr']/n:.4f} SSIM {sums['ssim']/n:.4f} "
                f"PSNR-Y {sums['psnr_y']/n:.4f} SSIM-Y {sums['ssim_y']/n:.4f} "
                f"LPIPS {sums['lpips']/n:.4f} time/img {sums['time']/n:.3f}s"
            )


if __name__ == "__main__":
    main()
