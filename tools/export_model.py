#!/usr/bin/env python
"""Export a trained model to a self-contained AOT serving artifact.

TPU-native replacement for the reference's live-process serving (gradio
``app.py`` / per-image ``test.py`` loops): one file holding the full jitted
restoration program (StableHLO via ``jax.export``) with weights and schedule
tables baked in — loads and runs without the model code or config system,
lowers for cpu+tpu in one artifact, and (by default) takes a symbolic batch
dim so one artifact serves any request batch.

    python tools/export_model.py -opt=configs/deraining/test/ir-sde.yml \
        --out derain.irsdex --size 128 [--batch 8] [--platforms cpu,tpu] \
        [--bf16] [--check]

    # inspect / serve
    python tools/export_model.py --inspect derain.irsdex
    python - <<'PY'
    from image_restoration_sde_tpu.exporting import load_artifact
    call, header = load_artifact("derain.irsdex")
    restored = call(lq_batch, seed)   # NHWC f32 [0,1], uint32 seed
    PY

Uses the same params ``tools/test.py`` evaluates (``path.pretrain_model_G``
— point it at the EMA checkpoint for reference-parity outputs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu import exporting
from image_restoration_sde_tpu.parallel import make_mesh
from image_restoration_sde_tpu.runners import (
    BokehLatentDiffusionTask,
    GaussianDenoisingTask,
    LatentDiffusionTask,
    PixelDiffusionTask,
    build_task,
)
from image_restoration_sde_tpu.utils import options


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, help="train/test YAML of the model")
    parser.add_argument("--out", type=str, help="artifact output path")
    parser.add_argument("--inspect", type=str, help="print an artifact's header and exit")
    parser.add_argument("--size", type=int, default=128, help="H=W the program is traced at")
    parser.add_argument("--batch", type=int, default=0, help="0 = symbolic batch dim")
    parser.add_argument("--platforms", type=str, default="cpu,tpu")
    parser.add_argument("--steps", type=int, default=0, help="override sample_T")
    parser.add_argument("--bf16", action="store_true",
                        help="serve at the bf16 operating point: score net "
                             "rebuilt with bf16 compute dtype AND its params "
                             "pre-cast to bf16 (halves both the artifact and "
                             "the per-step HBM traffic; matches the measured "
                             "BENCH.md configuration)")
    parser.add_argument("--sidecar", action="store_true",
                        help="store weights beside the program instead of "
                             "baking them into the StableHLO (small compile "
                             "payloads; required for remote-compile backends "
                             "that cap request size)")
    parser.add_argument("--kernels", action="store_true",
                        help="keep pallas kernels in the artifact "
                             "(requires --batch >= gate and --platforms tpu)")
    parser.add_argument("--per-sample-seed", action="store_true",
                        help="export call(lq, seeds) with a uint32 (b,) seed "
                             "VECTOR instead of one scalar: each sample's "
                             "noise depends only on its own seed, so a "
                             "micro-batching server (tools/serve.py) returns "
                             "bit-identical results for identical "
                             "(image, seed) requests regardless of what "
                             "batch they ride in")
    parser.add_argument("--lens", type=float, nargs=3, default=None,
                        metavar=("SRC", "TGT", "DISPARITY"),
                        help="bokeh latent models only: bake these lens "
                             "conditioning constants into the artifact "
                             "(default 18 160 35 — the reference bokeh "
                             "app's hardcoded params)")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and verify against the live sampler")
    args = parser.parse_args()

    if args.inspect:
        print(json.dumps(exporting.read_header(args.inspect), indent=2, sort_keys=True))
        return

    if not args.opt or not args.out:
        parser.error("-opt and --out are required (or use --inspect)")

    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))
    mesh = make_mesh()
    task = build_task(opt, mesh, seed=0, base_key=jax.random.PRNGKey(0))
    task.maybe_load_pretrained(resume=False)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    batch = args.batch or None
    steps = args.steps or (int(opt["sde"]["sample_T"]) if opt["sde"]["sample_T"] else None)
    cast = jnp.bfloat16 if args.bf16 else None
    meta = {"config": opt["name"], "model_type": opt["model"]}
    size = (args.size, args.size)
    params = task.state.params

    net = task.net
    if args.bf16 and getattr(net, "dtype", None) == jnp.float32:
        # precast alone leaves the ACTIVATIONS f32 (flax promotes bf16
        # params x f32 features back to f32): the traced program would do
        # double the HBM traffic of the live bf16 operating point
        # (measured +32%/call on TPU).  Rebuild the score net with bf16
        # compute — same param pytree, so task.state.params bind as-is.
        net = net.clone(dtype=jnp.bfloat16)

    if isinstance(task, BokehLatentDiffusionTask):
        # the (lq, seed) serving interface has no lens tuple, so the lens
        # conditioning is baked as export-time constants — same use case the
        # reference bokeh app covers with hardcoded lens params
        # (ref config/latent-bokeh/app.py:31-33)
        lens = tuple(args.lens) if args.lens else (18.0, 160.0, 35.0)

        def apply_with_lens(p, xt, cond_img, tvec, lens_tuple):
            return net.apply(p, xt, cond_img, tvec, lens_info=lens_tuple)

        data = exporting.export_latent_sampler(
            task.sde, apply_with_lens, task.encode_fn, task.decode_fn,
            task.latent_params, params, size,
            mode=task._mode, steps=steps, batch=batch, platforms=platforms,
            kernels=args.kernels, cast_params=cast, cond=lens,
            sidecar=args.sidecar, per_sample_seed=args.per_sample_seed,
            meta=meta,
        )
    elif isinstance(task, GaussianDenoisingTask):
        data = exporting.export_denoising_sampler(
            task.sde, lambda p, x, tvec: net.apply(p, x, None, tvec),
            params, size, task.sigma,
            batch=batch, platforms=platforms, kernels=args.kernels,
            cast_params=cast, sidecar=args.sidecar, meta=meta,
        )
    elif isinstance(task, LatentDiffusionTask):
        data = exporting.export_latent_sampler(
            task.sde, net.apply, task.encode_fn, task.decode_fn,
            task.latent_params, params, size,
            mode=task._mode, steps=steps, batch=batch, platforms=platforms,
            kernels=args.kernels, cast_params=cast, sidecar=args.sidecar,
            per_sample_seed=args.per_sample_seed, meta=meta,
        )
    elif isinstance(task, PixelDiffusionTask):
        mode = opt["sde"]["sampling_mode"] or "sde"
        # same channel math as PixelDiffusionTask.__init__ (stereo stacks eyes)
        in_nc = int(task.setting.get("in_nc") or task.setting.get("img_channel") or 3)
        if getattr(task, "stereo", False):
            in_nc *= 2
        data = exporting.export_restoration_sampler(
            task.sde, net.apply, params, size,
            mode=mode, steps=steps, channels=in_nc, batch=batch,
            platforms=platforms, kernels=args.kernels, cast_params=cast,
            sidecar=args.sidecar, per_sample_seed=args.per_sample_seed,
            meta=meta,
        )
    else:
        raise SystemExit(
            f"export not supported for task {type(task).__name__} "
            "(pixel and latent diffusion models only)"
        )

    with open(args.out, "wb") as f:
        f.write(data)
    header = exporting.read_header(args.out)
    print(f"wrote {args.out} ({len(data)/1e6:.1f} MB)")
    print(json.dumps(header, indent=2, sort_keys=True))

    if args.check:
        call, _ = exporting.load_artifact(args.out)
        b = args.batch or 1
        lq = jax.random.uniform(
            jax.random.PRNGKey(0), (b, args.size, args.size,
                                    header.get("channels", 3)), jnp.float32
        )
        seed0 = (jnp.arange(b, dtype=jnp.uint32)
                 if header.get("seed") == "per_sample" else jnp.uint32(0))
        out = np.asarray(call(lq, seed0))
        assert out.shape[:1] == (b,) and np.isfinite(out).all(), "artifact check failed"
        print(f"check OK: {out.shape}, mean {out.mean():.4f}")


if __name__ == "__main__":
    main()
