#!/usr/bin/env python
"""Single-image restoration CLI.

Usage: python tools/restore.py -opt=<test yml> -i input.png -o output.png
       [--tile 512 --tile-overlap 64]

Loads the task (and checkpoint) from a test-format YAML like tools/test.py,
restores one image, writes the PNG. Use --tile for large inputs.
"""

from __future__ import annotations

import argparse
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
import numpy as np

from image_restoration_sde_tpu.data.io_utils import read_img, save_img
from image_restoration_sde_tpu.parallel import make_mesh
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.utils import options, tensor2img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--tile", type=int, default=0)
    parser.add_argument("--tile-overlap", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))
    mesh = make_mesh()
    key = jax.random.PRNGKey(args.seed)
    task = build_task(opt, mesh, args.seed, key)
    task.maybe_load_pretrained(resume=False)
    params = task.state.params

    lq = read_img(args.input)[None]
    t0 = time.perf_counter()
    if args.tile and hasattr(task, "sample_batch"):
        from image_restoration_sde_tpu.tiling import tiled_restore

        out = tiled_restore(task.sample_batch, params, lq, key,
                            tile=args.tile, overlap=args.tile_overlap)
    else:
        out, _ = task.infer(params, {"LQ": lq.astype(np.float32)}, key)
    dt = time.perf_counter() - t0
    save_img(tensor2img(out[0]), args.output)
    print(f"restored {args.input} -> {args.output} in {dt:.2f}s "
          f"({lq.shape[2]}x{lq.shape[1]})")


if __name__ == "__main__":
    main()
