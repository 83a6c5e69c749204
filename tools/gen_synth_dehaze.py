#!/usr/bin/env python
"""Generate a synthetic paired dehazing dataset (structured GT + hazy LQ).

For on-chip end-to-end runs of the two-stage Refusion pipeline when no real
dataset ships with the environment: GT images are structured (colored
gradients + gaussian blobs + sinusoidal texture — learnable content, unlike
pure noise), LQ applies an atmospheric-scattering haze
``LQ = GT * t + A * (1 - t)`` with per-image transmission t and airlight A
(the standard haze model the reference's dehazing task targets).

  python tools/gen_synth_dehaze.py --out /tmp/dehaze --n-train 32 --n-val 4 \\
      --size 512
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_gt(rng: np.random.Generator, size: int) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size, 3), np.float32)
    # colored linear gradient base
    for c in range(3):
        a, b, d = rng.uniform(-0.5, 0.5, 3)
        img[..., c] = 0.5 + a * xx + b * yy + d * xx * yy
    # gaussian blobs
    for _ in range(rng.integers(6, 14)):
        cx, cy = rng.uniform(0, 1, 2)
        s = rng.uniform(0.03, 0.18)
        amp = rng.uniform(-0.6, 0.6, 3)
        g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        img += g[..., None] * amp[None, None]
    # sinusoidal texture (high-frequency content for the compressor skips)
    for _ in range(3):
        fx, fy = rng.uniform(4, 40, 2)
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.02, 0.1)
        img += amp * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)[..., None]
    return np.clip(img, 0.0, 1.0)


def hazify(rng: np.random.Generator, gt: np.ndarray) -> np.ndarray:
    t = rng.uniform(0.45, 0.75)
    airlight = rng.uniform(0.8, 1.0, 3).astype(np.float32)
    # mild spatial variation of transmission (depth-ish vertical ramp)
    size = gt.shape[0]
    ramp = np.linspace(-0.1, 0.1, size, dtype=np.float32)[:, None, None]
    tmap = np.clip(t + ramp, 0.3, 0.95)
    return np.clip(gt * tmap + airlight[None, None] * (1 - tmap), 0.0, 1.0)


def write_split(root: str, split: str, n: int, size: int, seed: int):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for sub in ("GT", "LQ"):
        os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    for i in range(n):
        gt = make_gt(rng, size)
        lq = hazify(rng, gt)
        for sub, img in (("GT", gt), ("LQ", lq)):
            Image.fromarray((img * 255).round().astype(np.uint8)).save(
                os.path.join(root, split, sub, f"im{i:04d}.png")
            )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True)
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-val", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    write_split(args.out, "train", args.n_train, args.size, args.seed)
    write_split(args.out, "val", args.n_val, args.size, args.seed + 1)
    print(f"wrote {args.n_train} train + {args.n_val} val pairs at {args.size}px to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
