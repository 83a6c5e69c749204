#!/usr/bin/env python
"""Minimal HTTP serving host for exported AOT artifacts (stdlib only).

Completes the deployment path the reference covers with a live torch+gradio
process (ref app.py): here the model is a sealed ``.irsdex`` artifact
(tools/export_model.py) — the server holds no model code, just
``exporting.load_artifact`` and image IO.

    python tools/serve.py --artifact derain.irsdex [--host 127.0.0.1] [--port 0]
                          [--max-batch 8] [--window-ms 5]

Endpoints:
- ``GET  /``                -> minimal HTML upload page (drop an image, see
  the restoration — the live-demo capability the reference covers with its
  gradio ``app.py``, ref config/deraining/app.py:27-38, served here by the
  stdlib so it runs without the gradio package)
- ``GET  /health``          -> artifact header JSON (+ serving config)
- ``POST /restore[?seed=N]`` -> body: PNG/JPEG image; response: restored PNG.
  Inputs smaller than the artifact's traced HxW are reflect-padded and
  cropped back; larger inputs are rejected (export at a bigger --size).

Concurrent requests are micro-batched into one device call (``MicroBatcher``):
the first request opens a ``--window-ms`` collection window, and up to
``--max-batch`` requests ride the same program invocation — this is how the
batch-8 TPU operating point (BENCH.md) is reached under serving load, and it
is *required* for fixed-batch artifacts (``--batch N`` exports), whose program
only accepts exactly N images.  Fixed-batch artifacts are padded with replica
rows when the window closes short; symbolic-batch artifacts round the batch
up to the next power of two CLAMPED to ``--max-batch`` (the cap is hard, and
at most log2(max_batch)+2 program variants ever compile).

Seed semantics (surfaced as ``serving.seed_reproducible`` in /health):
artifacts exported with ``--per-sample-seed`` take a seed VECTOR — every
rider keeps its own seed, so identical (image, seed) requests return
bit-identical results under any batching.  Legacy scalar-seed artifacts use
the first rider's seed for the whole batch (each image still draws distinct
noise by batch position); those are exactly reproducible only with
``--max-batch 1``.

``--port 0`` binds an ephemeral port; the bound port is printed as
``serving on <host>:<port>`` (machine-parsable, used by the tests).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class MicroBatcher:
    """Groups concurrent restore requests into one batched program call.

    ``call(batch_f32_nhwc, seed) -> batch_f32_nhwc`` is the artifact's entry.
    ``fixed`` (from the artifact header) pins the program's only legal batch;
    ``None`` means a symbolic batch dim.  A worker thread drains the queue:
    the first request starts a ``window_s`` collection window, then the
    assembled batch runs once and each caller's Future gets its row.
    """

    def __init__(self, call, *, fixed=None, max_batch=8, window_s=0.005,
                 max_wait_s=None, per_sample_seed=False):
        self.call = call
        self.fixed = int(fixed) if fixed else None
        self.max_batch = self.fixed or max(1, int(max_batch))
        # per-sample-seed artifacts (header seed == "per_sample") take a
        # uint32 (b,) seed vector: every rider keeps its OWN seed, so
        # identical (image, seed) requests are bit-reproducible no matter
        # what batch they share (exporting.py per_sample_seed)
        self.per_sample_seed = bool(per_sample_seed)
        self.window_s = float(window_s)
        # latency knob: hard cap on how long a request can sit in the
        # collection queue — when exceeded, a PARTIAL batch dispatches even
        # while the device is busy (default None = throughput-optimal
        # busy-aware collection, batches stay full under load)
        self.max_wait_s = float(max_wait_s) if max_wait_s else None
        self.q: "queue.Queue" = queue.Queue()
        # dispatch/completion pipeline: jax dispatch is async, so the worker
        # hands the un-synchronized device output to a completer thread and
        # immediately collects the next batch — batch N+1 transfers+queues
        # while batch N executes.  maxsize bounds device queue depth.
        self._done_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._inflight = 0  # dispatched-but-uncompleted batches (under _lock)
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._completer = threading.Thread(target=self._complete, daemon=True)
        self._completer.start()

    def submit(self, img: np.ndarray, seed: int) -> Future:
        fut: Future = Future()
        self.q.put((img, seed, fut))
        return fut

    def _assemble(self, items):
        xs = np.stack([it[0] for it in items])
        n = len(items)
        if self.fixed is not None:
            target = self.fixed
        else:  # pow2 buckets bound the number of compiled batch variants
            target = 1
            while target < n:
                target *= 2
            # never pad past the user's cap: a non-pow2 --max-batch would
            # otherwise round 5-6 pending requests up to batch 8 — the cap
            # itself becomes the one extra bucket (still O(log) variants)
            target = min(target, self.max_batch)
        if n < target:  # replica rows: no NaN paths, dtype/layout identical
            xs = np.concatenate([xs, np.repeat(xs[-1:], target - n, axis=0)])
        return xs

    def _worker(self):
        import jax.numpy as jnp

        while True:
            items = [self.q.get()]
            if self.max_batch > 1:
                now = time.monotonic()
                hard = None if self.max_wait_s is None else now + self.max_wait_s
                deadline = now + self.window_s
                if hard is not None:
                    deadline = min(deadline, hard)
                while len(items) < self.max_batch:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        with self._lock:
                            busy = self._inflight > 0
                        if not busy:
                            break
                        if hard is not None and time.monotonic() >= hard:
                            break  # latency bound: ship the partial batch
                        # the device is still executing the previous batch —
                        # dispatching now would only queue a padded partial
                        # batch behind it; collecting longer is free and keeps
                        # batches full (throughput = full-batch rate).
                        left = 0.002
                    try:
                        items.append(self.q.get(timeout=left))
                    except queue.Empty:
                        pass
            try:
                xs = self._assemble(items)
                if self.per_sample_seed:
                    seeds = np.array([it[1] for it in items], np.uint32)
                    if len(seeds) < len(xs):  # pad rows reuse the last seed
                        seeds = np.concatenate([seeds, np.full(
                            len(xs) - len(seeds), seeds[-1], np.uint32)])
                    seed_arg = jnp.asarray(seeds)
                else:
                    seed_arg = jnp.uint32(items[0][1])
                out = self.call(jnp.asarray(xs), seed_arg)
                with self._lock:
                    self._inflight += 1
                self._done_q.put((items, out))  # not yet synchronized
            except Exception as e:  # noqa: BLE001 — fan the failure out, keep serving
                for _, _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _complete(self):
        while True:
            items, out = self._done_q.get()
            try:
                out = np.asarray(out)  # blocks until the device call finishes
                for i, (_, _, fut) in enumerate(items):
                    fut.set_result(out[i])
            except Exception as e:  # noqa: BLE001 — fan the failure out, keep serving
                for _, _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            finally:
                with self._lock:
                    self._inflight -= 1


_UI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>IR-SDE restoration</title><style>
body{font-family:system-ui,sans-serif;max-width:860px;margin:2rem auto;padding:0 1rem;color:#222}
fieldset{border:1px solid #ccc;border-radius:8px;margin-bottom:1rem}
.row{display:flex;gap:1rem;flex-wrap:wrap}figure{margin:0}
img{max-width:400px;border:1px solid #ddd;border-radius:4px;display:block}
#status{color:#666}button{padding:.4rem 1rem}</style></head><body>
<h1>IR-SDE image restoration</h1>
<p>Drop a degraded image; the server runs the full reverse-SDE chain on the
exported model and returns the restoration. See <a href="/health">/health</a>
for the artifact header.</p>
<fieldset><legend>Input</legend>
<input type="file" id="file" accept="image/*">
<label>seed <input type="number" id="seed" value="0" style="width:6em"></label>
<button id="go">Restore</button> <span id="status"></span></fieldset>
<div class="row">
<figure><figcaption>input</figcaption><img id="in" alt=""></figure>
<figure><figcaption>restored</figcaption><img id="out" alt=""></figure></div>
<script>
const $=id=>document.getElementById(id);
$("file").addEventListener("change",()=>{const f=$("file").files[0];
  if(f) $("in").src=URL.createObjectURL(f);});
$("go").addEventListener("click",async()=>{
  const f=$("file").files[0];
  if(!f){$("status").textContent="pick an image first";return;}
  $("status").textContent="restoring\\u2026";$("go").disabled=true;
  try{
    const r=await fetch("/restore?seed="+encodeURIComponent($("seed").value||0),
                        {method:"POST",body:f});
    if(!r.ok){$("status").textContent="error: "+await r.text();return;}
    $("out").src=URL.createObjectURL(await r.blob());
    $("status").textContent="done";
  }catch(e){$("status").textContent="error: "+e;}
  finally{$("go").disabled=false;}
});
</script></body></html>"""


def build_handler(call, header, *, max_batch=8, window_ms=5.0,
                  max_wait_ms=None):
    H, W = header["size"]
    channels = header.get("channels", 3)
    fixed = header.get("batch")
    fixed = fixed if isinstance(fixed, int) else None
    seed_kind = header.get("seed", "scalar")
    batcher = MicroBatcher(
        call, fixed=fixed, max_batch=max_batch, window_s=window_ms / 1000.0,
        max_wait_s=None if max_wait_ms is None else max_wait_ms / 1000.0,
        per_sample_seed=seed_kind == "per_sample",
    )
    info = dict(header)
    info["serving"] = {
        "max_batch": batcher.max_batch,
        "window_ms": float(window_ms),
        "max_wait_ms": None if max_wait_ms is None else float(max_wait_ms),
        "fixed_batch": batcher.fixed,
        # "per_sample"-seed artifacts carry each rider's own seed, so
        # request+seed is bit-reproducible under any batching; legacy
        # scalar-seed artifacts use the first rider's seed for the batch
        # and a request's noise depends on its batch position — those are
        # reproducible only when batches are never shared (--max-batch 1).
        # "ignored" = deterministic sampler (reverse ODE), trivially so.
        "seed_reproducible": seed_kind in ("per_sample", "ignored")
        or batcher.max_batch == 1,
    }

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
        out = batcher.submit(x, seed).result()[:h, :w]
        return (np.clip(out, 0.0, 1.0) * 255.0).round().astype(np.uint8)

    class Handler(BaseHTTPRequestHandler):
        # keep-alive: concurrent clients hold one connection each instead of
        # reconnecting per request — a reconnect storm at wave boundaries
        # overflows the TCP accept backlog and surfaces as connection resets
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet; stdout is the contract
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path in ("/", "/index.html"):
                return self._send(200, _UI_HTML.encode(), "text/html; charset=utf-8")
            if path != "/health":
                return self._send(404, b"not found", "text/plain")
            body = json.dumps(info, sort_keys=True).encode()
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
    parser.add_argument("--max-batch", type=int, default=8,
                        help="micro-batch cap for symbolic-batch artifacts "
                             "(fixed-batch artifacts pin their own)")
    parser.add_argument("--window-ms", type=float, default=5.0,
                        help="micro-batch collection window after the first "
                             "request of a batch arrives")
    parser.add_argument("--max-wait-ms", type=float, default=None,
                        help="hard queue-latency bound: dispatch a PARTIAL "
                             "batch once the oldest pending request has "
                             "waited this long, even while the device is "
                             "busy. Set it when expected concurrency is "
                             "BELOW the batch size (measured +14%% req/s "
                             "AND -14%% p50 at concurrency 8 / batch 8); "
                             "leave unset under saturating load, where "
                             "partial batches cost full program calls "
                             "(BENCH.md). Default: unbounded busy-aware "
                             "collection — throughput-optimal when loaded.")
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    if os.environ.get("IRSDE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])

    from image_restoration_sde_tpu.exporting import load_artifact

    call, header = load_artifact(args.artifact)
    handler, restore = build_handler(
        call, header, max_batch=args.max_batch, window_ms=args.window_ms,
        max_wait_ms=args.max_wait_ms,
    )

    # warm the compiled path before accepting traffic (first jax.export call
    # compiles for the local backend; ~seconds).  The full-batch variant is
    # the steady-state program under load; smaller pow2 buckets of a
    # symbolic-batch artifact compile on first use.
    import jax.numpy as jnp

    H, W = header["size"]
    b = header["batch"] if isinstance(header.get("batch"), int) else args.max_batch
    seed0 = (jnp.zeros((b,), jnp.uint32)
             if header.get("seed") == "per_sample" else jnp.uint32(0))
    np.asarray(call(jnp.zeros((b, H, W, header.get("channels", 3)), jnp.float32),
                    seed0))

    class Server(ThreadingHTTPServer):
        daemon_threads = True
        request_queue_size = 128  # socketserver default 5 RSTs bursty clients

    srv = Server((args.host, args.port), handler)
    print(f"serving on {srv.server_address[0]}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
