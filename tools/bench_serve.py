#!/usr/bin/env python
"""Benchmark tools/serve.py end-to-end: HTTP in, restored PNG out.

Spawns the serving host on an exported artifact, fires ``--n`` requests from
``--concurrency`` client threads (each request a random PNG at the artifact's
traced size), and reports one JSON line: requests/s, per-request latency
percentiles, and the effective device batch (from the server's /health).

    python tools/bench_serve.py --artifact derain_b8.irsdex \
        [--n 64] [--concurrency 16] [--max-batch 8] [--window-ms 5] [--addr HOST:PORT]

With ``--addr`` it benches an already-running server instead of spawning one.
The first ``--warmup`` requests are excluded from timing (they may compile
smaller pow2 batch buckets of a symbolic-batch artifact).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def make_png(size, channels, seed=0):
    from PIL import Image

    rs = np.random.RandomState(seed)
    shape = (size[0], size[1], channels) if channels != 1 else (size[0], size[1])
    img = (rs.rand(*shape) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def fire(addr, body, n, concurrency, timeout=600.0):
    """n POSTs from `concurrency` threads; returns per-request latencies."""
    lat = [None] * n
    idx = iter(range(n))
    lock = threading.Lock()
    errors = []

    def worker():
        while True:
            with lock:
                try:
                    i = next(idx)
                except StopIteration:
                    return
            req = urllib.request.Request(
                f"http://{addr}/restore?seed={i}", data=body, method="POST",
                headers={"Content-Type": "image/png"},
            )
            t0 = time.perf_counter()
            for attempt in (0, 1):  # one retry: TCP-level resets are transient
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as r:
                        r.read()
                    lat[i] = time.perf_counter() - t0
                    break
                except ConnectionResetError:
                    if attempt:
                        errors.append(f"req {i}: ConnectionResetError (retried)")
                except Exception as e:  # noqa: BLE001 — collect, report at the end
                    errors.append(f"req {i}: {type(e).__name__}: {e}")
                    break

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError("; ".join(errors[:5]))
    return wall, [x for x in lat if x is not None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact")
    parser.add_argument("--addr", help="bench a running server instead")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--concurrency", type=int, default=16)
    parser.add_argument("--warmup", type=int, default=16)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--window-ms", type=float, default=5.0)
    parser.add_argument("--max-wait-ms", type=float, default=None,
                        help="forwarded to serve.py: hard queue-latency "
                             "bound (partial-batch dispatch)")
    args = parser.parse_args()
    if not args.artifact and not args.addr:
        parser.error("--artifact or --addr required")

    proc = None
    try:
        if args.addr:
            addr = args.addr
        else:
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            cmd = [sys.executable, os.path.join(REPO, "tools", "serve.py"),
                   "--artifact", args.artifact, "--port", "0",
                   "--max-batch", str(args.max_batch),
                   "--window-ms", str(args.window_ms)]
            if args.max_wait_ms is not None:
                cmd += ["--max-wait-ms", str(args.max_wait_ms)]
            proc = subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
            )
            line = proc.stdout.readline()  # blocks until warmed + bound
            assert line.startswith("serving on "), line
            addr = line.strip().split()[-1]

        with urllib.request.urlopen(f"http://{addr}/health", timeout=60) as r:
            header = json.loads(r.read())
        body = make_png(header["size"], header.get("channels", 3))

        if args.warmup:
            fire(addr, body, args.warmup, args.concurrency)
        wall, lat = fire(addr, body, args.n, args.concurrency)
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        out = {
            "artifact": header.get("config", "?"),
            "kind": header["kind"],
            "size": header["size"],
            "serving": header.get("serving"),
            "n": args.n,
            "concurrency": args.concurrency,
            "requests_per_s": round(args.n / wall, 3),
            "latency_ms": {
                "p50": round(float(np.percentile(lat_ms, 50)), 1),
                "p90": round(float(np.percentile(lat_ms, 90)), 1),
                "p99": round(float(np.percentile(lat_ms, 99)), 1),
            },
        }
        print(json.dumps(out), flush=True)
    finally:
        if proc is not None:
            proc.kill()
            proc.wait(timeout=30)


if __name__ == "__main__":
    main()
