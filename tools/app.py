#!/usr/bin/env python
"""Gradio demo UI: drop an image, get the restored output.

Parity: ref ``config/deraining/app.py:27-38`` (simple image->image) and
``config/latent-bokeh/app.py:28-49`` (latent pipeline with hardcoded lens
params — pass --src-lens/--tgt-lens/--disparity here instead).

Requires the ``gradio`` package (not part of the core deps); the model/task
comes from the same test-format YAML as tools/test.py.

Usage: python tools/app.py -opt=configs/deraining/test/ir-sde.yml [--port 7860]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
import numpy as np

from image_restoration_sde_tpu.parallel import make_mesh
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.utils import options, tensor2img


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--src-lens", type=float, default=18.0)
    parser.add_argument("--tgt-lens", type=float, default=-160.0)
    parser.add_argument("--disparity", type=float, default=1.0)
    args = parser.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "The web demo needs the 'gradio' package (pip install gradio); "
            "the core framework does not depend on it."
        )

    opt = options.dict_to_nonedict(options.parse(args.opt, is_train=False))
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    task = build_task(opt, mesh, 0, key)
    task.maybe_load_pretrained(resume=False)
    params = task.state.params

    def restore(img):
        lq = np.asarray(img).astype(np.float32)[None] / 255.0
        batch = {"LQ": lq}
        if opt["datasets"] and any(
            (d or {}).get("mode", "").startswith("Bokeh") for d in opt["datasets"].values()
        ):
            batch.update(
                src_lens=np.float32(args.src_lens),
                tgt_lens=np.float32(args.tgt_lens),
                disparity=np.float32(args.disparity),
            )
        out, _ = task.infer(params, batch, key)
        return tensor2img(out[0])

    demo = gr.Interface(
        fn=restore,
        inputs=gr.Image(type="numpy", label="degraded input"),
        outputs=gr.Image(type="numpy", label="restored output"),
        title=f"image-restoration-sde (TPU) — {opt['name']}",
    )
    demo.launch(server_port=args.port)


if __name__ == "__main__":
    main()
