#!/usr/bin/env python
"""One-command quality-parity harness against the reference's headline table.

Given a Rain100H-style paired folder and the published IR-SDE checkpoint,
imports the torch weights, runs the full reverse sampler, and prints
PSNR / SSIM / LPIPS next to the reference's published numbers
(Rain100H 31.65 dB / 0.9041 / 0.047, ref README.md:42-51).  Exits nonzero
when PSNR falls more than ``--tolerance`` dB short of the target, so the
north-star claim is a single command whenever the assets exist:

  python tools/eval_parity.py --data /path/to/Rain100H --pth rain100h_sde.pth

Layout: ``--data`` must contain ``GT/`` and ``LQ/`` image folders (the
reference test config's dataroot pair, config/deraining/options/test/
ir-sde.yml); or pass ``--gt``/``--lq`` explicitly.  Checkpoints may be the
reference's ``.pth`` (imported via utils/torch_import) or this framework's
orbax directories.  Metric math mirrors ref test.py:130-219 (RGB + Y-channel
PSNR/SSIM, LPIPS(alex) when the package is available).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu.data.io_utils import (
    get_paths_from_images,
    read_img,
    save_img,
)
from image_restoration_sde_tpu.data.transforms import rgb2ycbcr
from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.sampling import (
    make_restoration_sampler,
    pad_to_bucket,
    unpad,
)
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training.checkpoint import load_params
from image_restoration_sde_tpu.utils import metrics, tensor2img

# Published reference results on Rain100H (ref README.md:42-51)
REFERENCE_TARGETS = {"psnr": 31.65, "ssim": 0.9041, "lpips": 0.047, "fid": 18.64}


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


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data", help="dir containing GT/ and LQ/ image folders")
    p.add_argument("--gt", help="GT folder (overrides --data/GT)")
    p.add_argument("--lq", help="LQ folder (overrides --data/LQ)")
    p.add_argument("--pth", required=True, help=".pth or orbax checkpoint to evaluate")
    p.add_argument("--arch", default="ConditionalUNet")
    p.add_argument("--setting", default='{"in_nc": 3, "out_nc": 3, "nf": 64, "depth": 4}',
                   help="network kwargs JSON (ref options/test/ir-sde.yml)")
    p.add_argument("--max-sigma", type=float, default=10.0)
    p.add_argument("--T", type=int, default=100)
    p.add_argument("--schedule", default="cosine")
    p.add_argument("--eps", type=float, default=0.005)
    p.add_argument("--mode", default="posterior", choices=["posterior", "sde", "ode"],
                   help="sampling mode (ref test config uses posterior)")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                   help="compute dtype (bf16 is the production TPU path)")
    p.add_argument("--max-images", type=int, default=0, help="0 = all")
    p.add_argument(
        "--lpips-pth", default=None,
        help="lpips.LPIPS(net='alex') full state_dict .pth for the in-repo "
             "JAX LPIPS (utils/lpips.py); also via IRSDE_LPIPS_PTH. Falls "
             "back to the lpips pip package if installed.")
    p.add_argument(
        "--fid-pth", default=None,
        help="InceptionV3 state_dict .pth/.npz (pytorch-fid or torchvision "
             "naming) for the in-repo JAX FID (utils/fid.py); also via "
             "IRSDE_FID_PTH — completes the published Rain100H metric "
             "table (ref README.md:46).")
    p.add_argument("--crop-border", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-dir", help="also save restored PNGs here")
    p.add_argument("--target-psnr", type=float, default=REFERENCE_TARGETS["psnr"])
    p.add_argument("--target-ssim", type=float, default=REFERENCE_TARGETS["ssim"])
    p.add_argument("--target-lpips", type=float, default=REFERENCE_TARGETS["lpips"])
    p.add_argument("--target-fid", type=float, default=REFERENCE_TARGETS["fid"])
    p.add_argument("--tolerance", type=float, default=0.1,
                   help="max allowed PSNR shortfall in dB before exiting nonzero")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    gt_root = args.gt or (os.path.join(args.data, "GT") if args.data else None)
    lq_root = args.lq or (os.path.join(args.data, "LQ") if args.data else None)
    if not (gt_root and lq_root):
        print("error: need --data <dir with GT/ and LQ/> or --gt/--lq", file=sys.stderr)
        return 2
    gt_paths = get_paths_from_images(gt_root)
    lq_paths = get_paths_from_images(lq_root)
    assert len(gt_paths) == len(lq_paths), (len(gt_paths), len(lq_paths))
    if args.max_images:
        gt_paths, lq_paths = gt_paths[: args.max_images], lq_paths[: args.max_images]

    setting = json.loads(args.setting)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    net = build_network(args.arch, {**setting, "dtype": dtype})
    dummy = jnp.zeros((1, 64, 64, int(setting.get("in_nc") or 3)), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), dummy, dummy, jnp.array([1.0]))
    rules = None
    if str(args.pth).endswith(".pth"):
        from image_restoration_sde_tpu.utils.torch_import import rules_for_network

        rules = rules_for_network(args.arch, setting)
    params = load_params(args.pth, params, torch_rules=rules)

    sde = IRSDE.create(max_sigma=args.max_sigma, T=args.T, schedule=args.schedule,
                       eps=args.eps)
    sampler = make_restoration_sampler(
        sde, net.apply, mode=args.mode,
        cast_params=dtype if dtype == jnp.bfloat16 else None,
    )
    key = jax.random.PRNGKey(args.seed)
    from image_restoration_sde_tpu.utils.fid import fid_metric_from_env_or_arg
    from image_restoration_sde_tpu.utils.lpips import lpips_fn_from_env_or_arg

    lpips_fn = lpips_fn_from_env_or_arg(args.lpips_pth) or try_lpips()
    fid_metric = fid_metric_from_env_or_arg(args.fid_pth)

    sums = dict(psnr=0.0, ssim=0.0, psnr_y=0.0, ssim_y=0.0, lpips=0.0, time=0.0)
    n, n_lpips = 0, 0
    for i, (gp, lp) in enumerate(zip(gt_paths, lq_paths)):
        gt = read_img(gp)[None]
        lq = read_img(lp)[None]
        vlq, hw = pad_to_bucket(lq, 64)
        t0 = time.perf_counter()
        out = unpad(sampler(params, jnp.asarray(vlq), jax.random.fold_in(key, i)), hw)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0

        o, g = tensor2img(out[0]), tensor2img(gt[0])
        if args.save_dir:
            base = os.path.splitext(os.path.basename(lp))[0]
            save_img(o, os.path.join(args.save_dir, f"{base}.png"))
        c = args.crop_border
        oc, gc = (o[c:-c, c:-c], g[c:-c, c:-c]) if c else (o, g)
        psnr = metrics.calculate_psnr(oc, gc)
        ssim = metrics.calculate_ssim(oc, gc)
        oy = rgb2ycbcr(oc.astype(np.float64) / 255.0, only_y=True) * 255
        gy = rgb2ycbcr(gc.astype(np.float64) / 255.0, only_y=True) * 255
        psnr_y = metrics.calculate_psnr(oy, gy)
        ssim_y = metrics.calculate_ssim(oy, gy)
        lscore = lpips_fn(oc, gc) if lpips_fn else None
        if fid_metric:
            fid_metric.update(oc, gc)
        sums["psnr"] += psnr
        sums["ssim"] += ssim
        sums["psnr_y"] += psnr_y
        sums["ssim_y"] += ssim_y
        sums["time"] += dt
        if lscore is not None:
            sums["lpips"] += lscore
            n_lpips += 1
        n += 1
        lp_str = f"{lscore:.4f}" if lscore is not None else "n/a"
        print(f"{i+1:3d} {os.path.basename(lp):24s} PSNR {psnr:7.4f}  SSIM {ssim:.4f}  "
              f"PSNR-Y {psnr_y:7.4f}  SSIM-Y {ssim_y:.4f}  LPIPS {lp_str}  {dt:.2f}s")

    if not n:
        print("error: no images evaluated", file=sys.stderr)
        return 2
    avg = {k: v / n for k, v in sums.items() if k != "lpips"}
    avg["lpips"] = sums["lpips"] / n_lpips if n_lpips else None

    print(f"\n=== parity vs reference ({n} images, {args.mode} sampling, "
          f"{args.T} steps, {args.dtype}) ===")
    print(f"{'metric':8s} {'this framework':>16s} {'reference':>11s}")
    print(f"{'PSNR':8s} {avg['psnr']:16.4f} {args.target_psnr:11.4f}")
    print(f"{'SSIM':8s} {avg['ssim']:16.4f} {args.target_ssim:11.4f}")
    lp_avg = f"{avg['lpips']:.4f}" if avg["lpips"] is not None else "n/a"
    print(f"{'LPIPS':8s} {lp_avg:>16s} {args.target_lpips:11.4f}")
    fid_val = (f"{fid_metric.result():.4f}"
               if fid_metric and fid_metric.out_stats.n >= 2 else "n/a")
    print(f"{'FID':8s} {fid_val:>16s} {args.target_fid:11.4f}")
    print(f"{'PSNR-Y':8s} {avg['psnr_y']:16.4f} {'-':>11s}")
    print(f"{'SSIM-Y':8s} {avg['ssim_y']:16.4f} {'-':>11s}")
    print(f"time/img {avg['time']:.3f}s")

    shortfall = args.target_psnr - avg["psnr"]
    if shortfall > args.tolerance:
        print(f"FAIL: PSNR {avg['psnr']:.4f} is {shortfall:.3f} dB below the "
              f"target {args.target_psnr} (tolerance {args.tolerance})")
        return 1
    print(f"PASS: PSNR within {args.tolerance} dB of the target "
          f"(margin {-shortfall:+.3f} dB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
