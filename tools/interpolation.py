#!/usr/bin/env python
"""Image-interpolation demo: morph source -> target by running the forward
mean-reverting SDE with the target image as the terminal mean.

Parity: ref ``codes/demos/interpolation.py:9-49`` (uses IRSDE.forward,
sde_utils.py:242-250) — except the whole T-step chain runs as one jitted
``lax.scan`` and states are written afterwards.

Usage: python tools/interpolation.py -s <src.png> -t <tgt.png> [--save dir]
       [--sigma 1.0] [-T 100] [--schedule cosine]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import os as _os
if _os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["IRSDE_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu.data.io_utils import read_img, save_img
from image_restoration_sde_tpu.sde import IRSDE, samplers
from image_restoration_sde_tpu.utils import tensor2img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--source", required=True)
    parser.add_argument("-t", "--target", required=True)
    parser.add_argument("--save", default="interpolation_states")
    parser.add_argument("--sigma", type=float, default=1.0)
    parser.add_argument("-T", type=int, default=100)
    parser.add_argument("--schedule", default="cosine")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    src = jnp.asarray(read_img(args.source))[None]
    tgt = jnp.asarray(read_img(args.target))[None]
    if src.shape != tgt.shape:
        raise ValueError(f"source {src.shape} and target {tgt.shape} must match")

    sde = IRSDE.create(max_sigma=args.sigma, T=args.T, schedule=args.schedule, eps=0.01)
    _, states = jax.jit(
        lambda s, m, k: samplers.forward_sde(sde, s, m, k, return_all=True)
    )(src, tgt, jax.random.PRNGKey(args.seed))

    os.makedirs(args.save, exist_ok=True)
    states = np.asarray(states)
    for t in range(states.shape[0]):
        save_img(tensor2img(states[t, 0]), os.path.join(args.save, f"state_{t + 1}.png"))
    print(f"saved {states.shape[0]} states to {args.save}/")


if __name__ == "__main__":
    main()
