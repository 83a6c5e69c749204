#!/usr/bin/env python
"""Unified evaluation driver.

Parity: ref ``config/<task>/test.py:70-219`` — batch-1 sweep over each test
set, save output/LQ/GT PNGs, report PSNR/SSIM (+Y-channel variants), LPIPS
when the ``lpips`` package is available, and per-image wall time.  The task
runner (pixel / gaussian-denoising / compressor / latent diffusion) is
selected by the YAML like in training.

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
# sitecustomize clobbers JAX_PLATFORMS; IRSDE_PLATFORM=cpu forces CPU here
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import numpy as np

from image_restoration_sde_tpu.data import create_dataloader, create_dataset
from image_restoration_sde_tpu.data.io_utils import save_img
from image_restoration_sde_tpu.data.transforms import rgb2ycbcr
from image_restoration_sde_tpu.parallel import make_mesh, process_is_primary
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.utils import metrics, options, split_eyes, tensor2img
from image_restoration_sde_tpu.utils.logging_utils import mkdirs, setup_logger


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
    parser.add_argument(
        "--lpips-pth", default=None,
        help="lpips.LPIPS(net='alex') full state_dict .pth for the in-repo "
             "JAX LPIPS (utils/lpips.py); also via IRSDE_LPIPS_PTH. Falls "
             "back to the lpips pip package if installed.")
    parser.add_argument(
        "--fid-pth", default=None,
        help="InceptionV3 state_dict .pth/.npz (pytorch-fid or torchvision "
             "naming) for the in-repo JAX FID (utils/fid.py); also via "
             "IRSDE_FID_PTH. FID is reported per test set.")
    args = parser.parse_args()
    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))

    # Multi-process safety (same hazard as in-training validation): every
    # process runs the jitted sampler (task.state may hold global mesh
    # arrays), but file writes and logging are rank-0-only.
    rank0 = process_is_primary()
    if rank0:
        mkdirs([opt["path"]["results_root"], opt["path"]["log"]])
        setup_logger("base", opt["path"]["log"], "test_" + opt["name"], screen=True, tofile=True)
    else:
        setup_logger("base", opt["path"]["log"], "test", screen=False)
    logger = logging.getLogger("base")
    if rank0:
        logger.info(options.dict2str(opt))

    mesh = make_mesh()
    key = jax.random.PRNGKey(opt["seed"] or 0)
    task = build_task(opt, mesh, int(opt["seed"] or 0), key)
    if not (opt["path"]["pretrain_model_G"] or opt["path"]["pretrain_model_L"]):
        raise ValueError("path.pretrain_model_G (or _L) is required for testing")
    task.maybe_load_pretrained(resume=False)
    params = task.state.params

    from image_restoration_sde_tpu.utils.fid import fid_metric_from_env_or_arg
    from image_restoration_sde_tpu.utils.lpips import lpips_fn_from_env_or_arg

    lpips_fn = lpips_fn_from_env_or_arg(args.lpips_pth) or try_lpips()
    fid_metric = fid_metric_from_env_or_arg(args.fid_pth)
    suffix = opt["suffix"] or ""

    for phase, dataset_opt in opt["datasets"].items():
        test_set = create_dataset(dataset_opt)
        test_loader = create_dataloader(test_set, dataset_opt, opt)
        name = dataset_opt["name"]
        logger.info(f"Testing [{name}] : {len(test_set)} images")
        out_dir = os.path.join(opt["path"]["results_root"], name)
        if rank0:
            mkdirs(out_dir)

        sums = dict(psnr=0.0, ssim=0.0, psnr_y=0.0, ssim_y=0.0, lpips=0.0, time=0.0)
        n, n_lpips = 0, 0
        if fid_metric:
            fid_metric.reset()  # FID is per test set
        for i, batch in enumerate(test_loader):
            has_gt = "GT" in batch
            path_key = "LQ_path" if "LQ_path" in batch else "GT_path"
            base = os.path.splitext(os.path.basename(batch[path_key][0]))[0] + suffix

            t0 = time.perf_counter()
            tile = opt["tile"]
            if tile and hasattr(task, "sample_batch"):
                # tiled inference for large images (one compiled tile shape)
                from image_restoration_sde_tpu.tiling import (
                    tiled_restore,
                    tiled_restore_device,
                )

                if "LQ" in batch:
                    lq_used = np.asarray(batch["LQ"])
                else:
                    _, lq_used = task.infer(params, batch, jax.random.fold_in(key, i))
                # tile_device: whole tile loop as one device program — one
                # upload/download per image instead of per tile batch
                tiler = tiled_restore_device if opt["tile_device"] else tiled_restore
                out = tiler(
                    task.sample_batch, params, lq_used, jax.random.fold_in(key, i),
                    tile=int(tile), overlap=int(opt["tile_overlap"] or 64),
                    tile_batch=int(opt["tile_batch"] or 4),
                )
            else:
                out, lq_used = task.infer(params, batch, jax.random.fold_in(key, i))
            dt = time.perf_counter() - t0

            out_img = tensor2img(out[0])
            if rank0:
                # stereo (6ch) outputs save as separate _L/_R eyes
                # (ref stereo-sr test.py:119 SR_img.chunk(2))
                for eye, img in split_eyes(out_img):
                    save_img(img, os.path.join(out_dir, f"{base}{eye}.png"))
                for eye, img in split_eyes(tensor2img(lq_used[0])):
                    save_img(img, os.path.join(out_dir, f"{base}_LQ{eye}.png"))

            if has_gt:
                gt_img = tensor2img(batch["GT"][0])
                if rank0:
                    for eye, img in split_eyes(gt_img):
                        save_img(img, os.path.join(out_dir, f"{base}_GT{eye}.png"))
                # ref test.py: crop_border defaults to the sr scale
                crop = int(opt["crop_border"] or (opt["degradation"]["scale"] if opt["distortion"] == "sr" else 0) or 0)
                o6, g6 = out_img, gt_img
                if crop:
                    o6, g6 = o6[crop:-crop, crop:-crop], g6[crop:-crop, crop:-crop]
                # per-eye metrics averaged for stereo (ref stereo test.py
                # scores L and R separately); single pass otherwise
                eyes = list(zip(split_eyes(o6), split_eyes(g6)))
                psnr = ssim = psnr_y = ssim_y = 0.0
                lp = 0.0 if lpips_fn else None
                for (_, o), (_, g) in eyes:
                    if fid_metric:
                        fid_metric.update(o, g)
                    psnr += metrics.calculate_psnr(o, g) / len(eyes)
                    ssim += metrics.calculate_ssim(o, g) / len(eyes)
                    oy = rgb2ycbcr(o.astype(np.float64) / 255.0, only_y=True) * 255
                    gy = rgb2ycbcr(g.astype(np.float64) / 255.0, only_y=True) * 255
                    psnr_y += metrics.calculate_psnr(oy, gy) / len(eyes)
                    ssim_y += metrics.calculate_ssim(oy, gy) / len(eyes)
                    if lpips_fn:
                        lp += lpips_fn(o, g) / len(eyes)
                sums["psnr"] += psnr
                sums["ssim"] += ssim
                sums["psnr_y"] += psnr_y
                sums["ssim_y"] += ssim_y
                if lp is not None:
                    sums["lpips"] += lp
                    n_lpips += 1
                sums["time"] += dt
                n += 1
                lp_str = f"{lp:.4f}" if lp is not None else "n/a"
                logger.info(
                    f"{i+1:3d} - {base:20s} | PSNR {psnr:.4f} SSIM {ssim:.4f} | "
                    f"PSNR-Y {psnr_y:.4f} SSIM-Y {ssim_y:.4f} | LPIPS {lp_str} | {dt:.2f}s"
                )
            else:
                logger.info(f"{i+1:3d} - {base:20s} | (no GT) | {dt:.2f}s")

        if n:
            lp_avg = f"{sums['lpips']/n_lpips:.4f}" if n_lpips else "n/a"
            fid_str = ""
            if fid_metric and fid_metric.out_stats.n >= 2:
                fid_str = f" FID {fid_metric.result():.4f}"
            logger.info(
                f"--- [{name}] avg over {n}: PSNR {sums['psnr']/n:.4f} SSIM {sums['ssim']/n:.4f} "
                f"PSNR-Y {sums['psnr_y']/n:.4f} SSIM-Y {sums['ssim_y']/n:.4f} "
                f"LPIPS {lp_avg}{fid_str} time/img {sums['time']/n:.3f}s"
            )

        if os.environ.get("IRSDE_LOG_HBM"):
            # peak device memory for the run (4K-class accounting, BENCH.md)
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            if peak is not None:
                logger.info(f"--- peak HBM: {peak / 2**30:.2f} GiB")


if __name__ == "__main__":
    main()
