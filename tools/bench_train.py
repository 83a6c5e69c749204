#!/usr/bin/env python
"""Training-throughput benchmark: images/sec/chip + MFU for the flagship
IR-SDE train step (UNet nf64 d4, 128px crops, batch from env BENCH_BATCH).

The reference publishes no training throughput (SURVEY §6); this
establishes ours. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
# match tools/train.py: kernels off on the training path (their custom-vjp
# bwd is ~2% slower than XLA's fused bwd — BENCH.md)
os.environ.setdefault("IRSDE_PALLAS_MIN_BATCH", "1000000000")
import jax.numpy as jnp

from image_restoration_sde_tpu.models import ConditionalUNet
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training import build_optimizer, create_train_state, make_train_step
from image_restoration_sde_tpu.utils.profiling import estimate_mfu


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    size = int(os.environ.get("BENCH_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    sde = IRSDE.create(max_sigma=10.0, T=100, schedule="cosine", eps=0.005)
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=64, depth=4, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    gt = jnp.clip(lq + 0.1, 0, 1)
    params = jax.jit(net.init)(key, lq, lq, jnp.zeros((batch,)))
    tx = build_optimizer("Adam", 1e-4, 0.9, 0.99)
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(sde, net.apply, tx, remat=remat), donate_argnums=0)

    state, _ = step_fn(state, lq, gt, key)  # compile
    jax.block_until_ready(state.params)

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        from image_restoration_sde_tpu.utils import profiling

        with profiling.trace(trace_dir):
            for _ in range(3):
                state, metrics = step_fn(state, lq, gt, key)
            jax.block_until_ready(metrics["loss"])
        print(f"# trace: python tools/trace_summary.py {trace_dir}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, lq, gt, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    ips = batch * steps / dt

    try:
        mfu = estimate_mfu(
            lambda s, a, b, k: make_train_step(sde, net.apply, tx)(s, a, b, k),
            (state, lq, gt, key),
            dt / steps,
        )
    except Exception:
        mfu = float("nan")

    print(json.dumps({
        "metric": f"train images/sec/chip (UNet nf64d4 bf16, {size}px, batch {batch}{', remat' if remat else ''})",
        "value": round(ips, 3),
        "unit": "img/s/chip",
        "mfu": round(mfu, 4),
        "step_ms": round(1000 * dt / steps, 2),
    }))


if __name__ == "__main__":
    main()
