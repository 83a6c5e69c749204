#!/usr/bin/env python
"""Static parameter / FLOP counter for the score net and compressor.

Parity: ref ``config/latent-dehazing/count_flops.py:22-26`` (torchsummaryX
over a 1x8x750x500 latent + a 1x3x6000x4000 image through the compressor),
implemented with XLA's own cost analysis (``lowered.cost_analysis()``), so
the number reflects what actually compiles.

Usage: python tools/count_flops.py -opt=<yml> [--height 750 --width 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import jax.numpy as jnp

from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.utils import options


def analyze(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    return float(cost.get("flops", float("nan")))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--height", type=int, default=750)
    parser.add_argument("--width", type=int, default=500)
    args = parser.parse_args()
    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))

    which, setting = options.network_setting(opt)
    net = build_network(which, setting)
    ch = int(setting.get("in_nc") or setting.get("img_channel") or 3)
    x = jnp.zeros((1, args.height, args.width, ch), jnp.float32)
    params = jax.eval_shape(lambda k: net.init(k, x, x, jnp.array([1.0])), jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"[{which}] params: {n_params/1e6:.2f} M")

    real_params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    flops = analyze(lambda p, a: net.apply(p, a, a, jnp.array([50.0])), real_params, x)
    print(f"[{which}] forward FLOPs @ {args.height}x{args.width}: {flops/1e9:.2f} G")

    if opt["network_L"]:
        which_l, setting_l = options.network_setting(opt, "network_L")
        lnet = build_network(which_l, setting_l)
        xl = jnp.zeros((1, args.height, args.width, int(setting_l.get("in_ch") or 3)))
        lparams = jax.jit(lnet.init)(jax.random.PRNGKey(0), xl)
        n_l = sum(p.size for p in jax.tree.leaves(lparams))
        fl = analyze(lambda p, a: lnet.apply(p, a), lparams, xl)
        print(f"[{which_l} compressor] params: {n_l/1e6:.2f} M, FLOPs: {fl/1e9:.2f} G")


if __name__ == "__main__":
    main()
