#!/usr/bin/env python
"""Training-throughput benchmark: images/sec/chip + MFU, one JSON line.

Workloads (env ``BENCH_ARCH``):

- ``unet`` (default) — the flagship IR-SDE train step (UNet nf64 d4,
  128px crops; ref options/train/ir-sde.yml).
- ``refusion`` — the NTIRE-winning Refusion latent recipe
  (ConditionalNAFNet w64 enc [1,1,1,28] on 8-ch latents, Lion, EMA;
  ref latent-dehazing nasde.yml:74-92).  ``BENCH_PIPE=latent`` (default)
  benches the score-net step at the 64^2-latent operating point
  (= 1024px crops / 16); ``BENCH_PIPE=full`` benches the REAL
  ``make_latent_train_step`` — 1024px crops through the frozen
  compressor — with ``BENCH_REMAT=1`` as the memory lever.

Other env: BENCH_BATCH, BENCH_SIZE (pixel crop size), BENCH_STEPS,
BENCH_REMAT, BENCH_TRACE (capture a profile).

The reference publishes no training throughput (SURVEY §6); this
establishes ours.
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


def _build_unet(batch, size, remat, key):
    sde = IRSDE.create(max_sigma=10.0, T=100, schedule="cosine", eps=0.005)
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=64, depth=4, dtype=jnp.bfloat16)
    lq = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    gt = jnp.clip(lq + 0.1, 0, 1)
    params = jax.jit(net.init)(key, lq, lq, jnp.zeros((batch,)))
    tx = build_optimizer("Adam", 1e-4, 0.9, 0.99)
    step_fn = make_train_step(sde, net.apply, tx, remat=remat)
    name = f"UNet nf64d4 bf16, {size}px"
    return step_fn, params, tx, lq, gt, name


def _build_refusion(batch, size, remat, key, pipe):
    """The NTIRE-winning latent recipe (ref nasde.yml:40-92): score net
    ConditionalNAFNet w64 enc [1,1,1,28] on 8-ch 1/16-res latents, Lion."""
    from image_restoration_sde_tpu.models.latent_unet import UNet
    from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
    from image_restoration_sde_tpu.training.latent import make_latent_train_step

    sde = IRSDE.create(max_sigma=50.0, T=100, schedule="cosine", eps=0.005)
    net = ConditionalNAFNet(
        img_channel=8, width=64, enc_blk_nums=(1, 1, 1, 28),
        middle_blk_num=1, dec_blk_nums=(1, 1, 1, 1), dtype=jnp.bfloat16,
    )
    tx = build_optimizer("Lion", 3e-5, 0.9, 0.99)
    if pipe == "latent":
        # score-net step at the latent operating point (size px / 16)
        lat = max(16, size // 16)
        lq = jax.random.normal(key, (batch, lat, lat, 8), jnp.float32) * 0.25
        gt = lq + 0.05
        params = jax.jit(net.init)(key, lq, lq, jnp.zeros((batch,)))
        step_fn = make_train_step(sde, net.apply, tx, remat=remat)
        name = f"Refusion NAFNet w64 enc[1,1,1,28] bf16, {lat}^2x8 latents"
        return step_fn, params, tx, lq, gt, name
    # full pipeline: frozen compressor encode of pixel crops + latent step.
    # BENCH_COMP_DTYPE=bfloat16 opts the frozen encode into bf16 (the YAML
    # lever is `network_L.setting.dtype: bfloat16`); default f32 matches
    # the reference configs.
    comp_dtype = jnp.dtype(os.environ.get("BENCH_COMP_DTYPE", "float32")).type
    comp = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(4, 8, 8, 16), embed_dim=8,
                dtype=comp_dtype)
    img = jax.random.uniform(key, (1, size, size, 3), jnp.float32)
    lat_params = jax.jit(comp.init)(key, img)
    encode_fn = lambda p, x: comp.apply(p, x, method=comp.encode)
    z, _ = jax.jit(encode_fn)(lat_params, img)
    params = jax.jit(net.init)(
        key, jnp.zeros(z.shape), jnp.zeros(z.shape), jnp.zeros((1,))
    )
    lq = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    gt = jnp.clip(lq + 0.1, 0, 1)
    step_fn = make_latent_train_step(
        sde, net.apply, encode_fn, lat_params, tx, remat=remat
    )
    name = f"Refusion full pipeline (frozen compressor) bf16, {size}px crops"
    return step_fn, params, tx, lq, gt, name


def main():
    arch = os.environ.get("BENCH_ARCH", "unet")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    size = int(os.environ.get("BENCH_SIZE", "128" if arch == "unet" else "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    pipe = os.environ.get("BENCH_PIPE", "latent")

    key = jax.random.PRNGKey(0)
    if arch == "refusion":
        raw_step, params, tx, lq, gt, name = _build_refusion(batch, size, remat, key, pipe)
    else:
        raw_step, params, tx, lq, gt, name = _build_unet(batch, size, remat, key)
    state = create_train_state(params, tx)
    step_fn = jax.jit(raw_step, donate_argnums=0)

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
        mfu = estimate_mfu(raw_step, (state, lq, gt, key), dt / steps)
    except Exception:
        mfu = float("nan")

    print(json.dumps({
        "metric": f"train images/sec/chip ({name}, batch {batch}{', remat' if remat else ''})",
        "value": round(ips, 3),
        "unit": "img/s/chip",
        "mfu": round(mfu, 4),
        "step_ms": round(1000 * dt / steps, 2),
    }))


if __name__ == "__main__":
    main()
