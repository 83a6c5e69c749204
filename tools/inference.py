#!/usr/bin/env python
"""Inference driver — restoration outputs only, no metrics.

Parity: ref ``config/denoising-sde/inference.py:69-111`` (input = provided
LQ, or GT + synthetic Gaussian noise at ``--sigma``; sampling starts at the
optimal timestep for that sigma and runs the reverse ODE) and
``config/stereo-sr/inference.py`` (LQ-only restoration sweep).  The task
runner is selected from the YAML exactly like train/test, so the same
driver serves both flows.

Usage: python tools/inference.py -opt=<yml> [--sigma 25]
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
from image_restoration_sde_tpu.parallel import make_mesh
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.utils import options, tensor2img
from image_restoration_sde_tpu.utils.logging_utils import mkdirs, setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument(
        "--sigma", type=float, default=None,
        help="override degradation.sigma (synthetic noise level on GT inputs)",
    )
    args = parser.parse_args()
    opt = options.parse(args.opt, is_train=False)
    if args.sigma is not None:
        opt.setdefault("degradation", {})["sigma"] = args.sigma
    opt = options.dict_to_nonedict(opt)

    mkdirs([opt["path"]["results_root"], opt["path"]["log"]])
    setup_logger("base", opt["path"]["log"], "inference_" + opt["name"], screen=True, tofile=True)
    logger = logging.getLogger("base")

    mesh = make_mesh()
    key = jax.random.PRNGKey(opt["seed"] or 0)
    task = build_task(opt, mesh, int(opt["seed"] or 0), key)
    if not (opt["path"]["pretrain_model_G"] or opt["path"]["pretrain_model_L"]):
        raise ValueError("path.pretrain_model_G (or _L) is required for inference")
    task.maybe_load_pretrained(resume=False)
    params = task.state.params
    suffix = opt["suffix"] or ""

    for phase, dataset_opt in opt["datasets"].items():
        test_set = create_dataset(dataset_opt)
        test_loader = create_dataloader(test_set, dataset_opt, opt)
        name = dataset_opt["name"]
        logger.info(f"Inference [{name}] : {len(test_set)} images")
        out_dir = os.path.join(opt["path"]["results_root"], name)
        mkdirs(out_dir)

        times = []
        for i, batch in enumerate(test_loader):
            path_key = "LQ_path" if "LQ_path" in batch else "GT_path"
            base = os.path.splitext(os.path.basename(batch[path_key][0]))[0] + suffix
            t0 = time.perf_counter()
            out, _ = task.infer(params, batch, jax.random.fold_in(key, i))
            times.append(time.perf_counter() - t0)
            save_img(tensor2img(out[0]), os.path.join(out_dir, f"{base}.png"))
            logger.info(f"{i+1:3d} - {base:20s} | {times[-1]:.2f}s")
        logger.info(f"--- [{name}] average test time: {np.mean(times):.4f}s over {len(times)}")


if __name__ == "__main__":
    main()
