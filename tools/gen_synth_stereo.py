#!/usr/bin/env python
"""Generate a synthetic stereo-SR dataset (HR eye pairs + matlab-bicubic LR).

Reference stereo datasets pair files as 2i (left) / 2i+1 (right)
(ref data/StereoLQGT_dataset.py); here the right eye is the left shifted by
a random horizontal disparity (4-16 px) so SCAM has real cross-eye signal,
and LR_x4 is the matlab-faithful bicubic 1/4 downscale the reference
training data uses.

  python tools/gen_synth_stereo.py --out /tmp/stereo --n-train 24 --n-val 4 \\
      --train-size 256 --val-size 128
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from gen_synth_dehaze import make_gt  # structured, learnable content


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=24)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--train-size", type=int, default=256)
    ap.add_argument("--val-size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from PIL import Image

    from image_restoration_sde_tpu.data.imresize import imresize

    rng = np.random.default_rng(args.seed)
    for split, n, size in (
        ("train", args.n_train, args.train_size),
        ("val", args.n_val, args.val_size),
    ):
        for d in ("HR", "LR_x4"):
            os.makedirs(os.path.join(args.out, split, d), exist_ok=True)
        for i in range(n):
            big = make_gt(rng, size + 32)  # extra width for the disparity crop
            disp = int(rng.integers(4, 17))
            eyes = (big[:size, :size], big[:size, disp : disp + size])
            for eye, img in enumerate(eyes):
                u8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
                name = f"{2 * i + eye:04d}.png"
                Image.fromarray(u8).save(os.path.join(args.out, split, "HR", name))
                lr = imresize(u8.astype(np.float64) / 255, 0.25)
                lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
                Image.fromarray(lr8).save(os.path.join(args.out, split, "LR_x4", name))
        print(f"{split}: {n} pairs at {size}px -> {os.path.join(args.out, split)}")


if __name__ == "__main__":
    main()
