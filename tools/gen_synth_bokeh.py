#!/usr/bin/env python
"""Generate a synthetic bokeh-transformation dataset (src/tgt/alpha/meta).

Mirrors the reference's EBB!-style layout (ref data/BokehLQGT_dataset.py):
``src/`` narrow-aperture images (everything sharp), ``tgt/`` wide-aperture
renders (foreground kept sharp through a smooth alpha matte, background
gaussian-blurred with a lens-dependent radius), ``alpha/`` the matte, and
``meta.txt`` lines ``id, src_lens, tgt_lens, disparity`` using the
reference's lens-string grammar (``Sony50mmf<f>BS``; lenstr2float parity).

  python tools/gen_synth_bokeh.py --out /tmp/bokeh --n-train 24 --n-val 4 \\
      --size 256
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_synth_dehaze import make_gt  # structured, learnable content


def smooth_alpha(rng: np.random.Generator, size: int) -> np.ndarray:
    """Foreground matte: union of soft blobs, values in [0, 1]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    a = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(1, 4)):
        cx, cy = rng.uniform(0.2, 0.8, 2)
        s = rng.uniform(0.08, 0.2)
        a = np.maximum(a, np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))))
    return np.clip(a * 1.4, 0.0, 1.0)


def render_bokeh(src: np.ndarray, alpha: np.ndarray, f_number: float) -> np.ndarray:
    """Wide-aperture render: background blur sigma ~ 1/f_number."""
    from scipy.ndimage import gaussian_filter

    sigma = 8.0 / max(f_number, 1.0)
    blurred = np.stack([gaussian_filter(src[..., c], sigma) for c in range(3)], -1)
    return alpha[..., None] * src + (1 - alpha[..., None]) * blurred


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=24)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("val", args.n_val)):
        root = os.path.join(args.out, split)
        for d in ("src", "tgt", "alpha"):
            os.makedirs(os.path.join(root, d), exist_ok=True)
        lines = []
        for i in range(n):
            gt = make_gt(rng, args.size)
            alpha = smooth_alpha(rng, args.size)
            tgt_f = float(rng.choice([1.8, 2.8, 4.0]))
            tgt = render_bokeh(gt, alpha, tgt_f)
            name = f"{i:04d}"
            for d, img in (("src", gt), ("tgt", tgt)):
                u8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
                Image.fromarray(u8).save(os.path.join(root, d, name + ".png"))
            a8 = (alpha * 255).round().astype(np.uint8)
            Image.fromarray(a8).save(os.path.join(root, "alpha", name + ".png"))
            lines.append(f"{name}, Sony50mmf16BS, Sony50mmf{tgt_f}BS, 1.0")
        with open(os.path.join(root, "meta.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {n} triplets at {args.size}px -> {root}")


if __name__ == "__main__":
    main()
