#!/usr/bin/env python
"""Minimal HTTP serving host for exported AOT artifacts (stdlib only).

Completes the deployment path the reference covers with a live torch+gradio
process (ref app.py): here the model is a sealed ``.irsdex`` artifact
(tools/export_model.py) — the server holds no model code, just
``exporting.load_artifact`` and image IO.

    python tools/serve.py --artifact derain.irsdex [--host 127.0.0.1] [--port 0]

Endpoints:
- ``GET  /health``          -> artifact header JSON
- ``POST /restore[?seed=N]`` -> body: PNG/JPEG image; response: restored PNG.
  Inputs smaller than the artifact's traced HxW are reflect-padded and
  cropped back; larger inputs are rejected (export at a bigger --size).

``--port 0`` binds an ephemeral port; the bound port is printed as
``serving on <host>:<port>`` (machine-parsable, used by the tests).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

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

from image_restoration_sde_tpu.exporting import load_artifact


def build_handler(call, header):
    H, W = header["size"]
    channels = header.get("channels", 3)

    def restore(img: np.ndarray, seed: int) -> np.ndarray:
        h, w = img.shape[:2]
        if h > H or w > W:
            raise ValueError(f"image {h}x{w} exceeds artifact size {H}x{W}")
        x = img.astype(np.float32) / 255.0
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] != channels:
            raise ValueError(f"expected {channels} channels, got {x.shape[-1]}")
        x = np.pad(x, ((0, H - h), (0, W - w), (0, 0)), mode="reflect")
        out = call(jnp.asarray(x)[None], jnp.uint32(seed))
        out = np.asarray(out)[0, :h, :w]
        return (np.clip(out, 0.0, 1.0) * 255.0).round().astype(np.uint8)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stdout is the contract
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/health":
                return self._send(404, b"not found", "text/plain")
            body = json.dumps(header, sort_keys=True).encode()
            self._send(200, body, "application/json")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/restore":
                return self._send(404, b"not found", "text/plain")
            try:
                from PIL import Image

                n = int(self.headers.get("Content-Length", "0"))
                img = np.asarray(Image.open(io.BytesIO(self.rfile.read(n))))
                seed = int(parse_qs(url.query).get("seed", ["0"])[0])
                out = restore(img, seed)
                buf = io.BytesIO()
                Image.fromarray(out.squeeze()).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
            except Exception as e:  # noqa: BLE001 — a serve loop must not die
                self._send(500, f"{type(e).__name__}: {e}".encode(), "text/plain")

    return Handler, restore


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    args = parser.parse_args()

    call, header = load_artifact(args.artifact)
    handler, restore = build_handler(call, header)

    # warm the compiled path before accepting traffic (first jax.export call
    # compiles for the local backend; ~seconds)
    H, W = header["size"]
    restore(np.zeros((H, W, header.get("channels", 3)), np.uint8), 0)

    srv = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"serving on {srv.server_address[0]}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
