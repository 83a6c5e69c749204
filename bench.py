#!/usr/bin/env python
"""Benchmark: restored images/sec/chip at 100 reverse-SDE steps.

The BASELINE.json north-star metric: full 100-step reverse diffusion with
the flagship IR-SDE derain score net (ConditionalUNet nf=64 depth=4) on
128x128 images — the reference's published Rain100H setup
(ir-sde.yml:30-37,46-52; sampling loop sde_utils.py:252-266).

The reference publishes no throughput number; the baseline constant below
is an estimate for its dev hardware (TITAN XP-class, torch 1.13 f32:
~50 GFLOP/forward x 100 steps at ~30% utilization => ~1 img/s 128px).
``vs_baseline`` is measured/estimated-reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
# sitecustomize clobbers JAX_PLATFORMS; IRSDE_PLATFORM=cpu forces CPU for
# smoke runs (same escape hatch as the other benches/drivers)
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 1.0  # estimated reference throughput (see docstring)


def main():
    from image_restoration_sde_tpu.models import ConditionalUNet
    from image_restoration_sde_tpu.sampling import make_restoration_sampler
    from image_restoration_sde_tpu.sde import IRSDE

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    sde = IRSDE.create(max_sigma=10.0, T=steps, schedule="cosine", eps=0.005)
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=64, depth=4, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = jax.jit(net.init)(key, lq, lq, jnp.zeros((batch,)))

    # cast_params=bf16 measured ~2% SLOWER for this conv UNet (params are a
    # small slice of its HBM traffic; the cast pass + layout change lose
    # more than the halved reads gain) — it is a win for the param-heavy
    # latent score nets (tools/bench_refusion.py) and stays off here.
    sampler = make_restoration_sampler(
        sde, net.apply, mode="sde",
        cast_params=jnp.bfloat16 if os.environ.get("BENCH_CAST") else None,
    )

    # warmup / compile — exercise the EXACT timed path (incl. fold_in, whose
    # own first-call compile otherwise lands inside the timed region)
    for i in (1_000_001, 1_000_002):
        out = sampler(params, lq, jax.random.fold_in(key, i))
        out.block_until_ready()

    # per-rep timing, median: the tunneled chip shows rare multi-second
    # outliers (grant renegotiation), which a single total-time window
    # would fold into the result
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sampler(params, lq, jax.random.fold_in(key, i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    imgs_per_sec = batch / statistics.median(times)
    print(
        json.dumps(
            {
                "metric": f"restored images/sec/chip ({steps}-step reverse SDE, {size}px, UNet nf64d4 bf16)",
                "value": round(imgs_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
                "baseline_kind": "analytic estimate (~1 img/s on the reference's "
                                 "TITAN XP dev hardware; the reference publishes "
                                 "no measured throughput)",
            }
        )
    )


if __name__ == "__main__":
    main()
