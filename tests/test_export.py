"""AOT export (jax.export serving artifacts): artifact format round-trip,
pixel + latent sampler export with symbolic batch and cpu+tpu lowering,
tight numeric agreement with the live sampler, and the CLI tool
end-to-end."""

import io
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_sde_tpu import exporting
from image_restoration_sde_tpu.models import ConditionalUNet
from image_restoration_sde_tpu.models.latent_unet import UNet
from image_restoration_sde_tpu.models.modules import no_pallas, use_pallas
from image_restoration_sde_tpu.models.nafnet import ConditionalNAFNet
from image_restoration_sde_tpu.sampling import make_restoration_sampler
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training.latent import make_latent_sampler

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_artifact_pack_roundtrip():
    header = {"kind": "x", "steps": 4}
    data = exporting.pack_artifact(header, b"payload-bytes")
    h2, p2 = exporting.unpack_artifact(data)
    assert h2 == header and p2 == b"payload-bytes"
    with pytest.raises(ValueError):
        exporting.unpack_artifact(b"NOTMAGIC" + data)


def test_no_pallas_context_forces_gates_off(monkeypatch):
    monkeypatch.setenv("IRSDE_PALLAS_LN", "1")  # site override says ON
    assert use_pallas(8, "ln")
    with no_pallas():
        assert not use_pallas(8, "ln")  # kill-switch wins over overrides
        with no_pallas():
            pass
        assert not use_pallas(8)  # nesting restores correctly
    assert use_pallas(8, "ln")


def test_export_pixel_sampler_symbolic_batch(tmp_path):
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=4, schedule="cosine", eps=0.005)

    data = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior",
        platforms=("cpu", "tpu"), meta={"config": "unit"},
    )
    path = tmp_path / "m.irsdex"
    path.write_bytes(data)

    header = exporting.read_header(str(path))
    assert header["kind"] == "restoration_sampler"
    assert header["platforms"] == ["cpu", "tpu"]
    assert header["batch"] == "symbolic"
    assert header["config"] == "unit"

    call, _ = exporting.load_artifact(str(path))
    live = make_restoration_sampler(sde, net.apply, mode="posterior", chunk=0)
    for b in (1, 3):
        lq = jax.random.uniform(jax.random.PRNGKey(b), (b, 16, 16, 3))
        got = call(lq, jnp.uint32(7))
        with no_pallas():
            want = live(params, lq, jax.random.PRNGKey(jnp.uint32(7)))
        assert got.shape == (b, 16, 16, 3)
        # separate XLA compilations fuse differently — tight, not bitwise
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
        )


def test_load_artifact_data_parallel():
    """One symbolic-batch artifact serves data-parallel: load_artifact(mesh=)
    re-jits the call with the batch sharded over 'data', output equal to the
    single-device call."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=4, schedule="cosine", eps=0.005)
    data = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", platforms=("cpu",))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    call_dp, _ = exporting.load_artifact(data, mesh=mesh)
    call, _ = exporting.load_artifact(data)
    lq = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3)),
        NamedSharding(mesh, P("data")),
    )
    out = call_dp(lq, jnp.uint32(3))
    assert out.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), out.ndim)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(call(jax.device_get(lq), jnp.uint32(3))),
        rtol=1e-5, atol=1e-5,
    )


def test_export_tpu_only_with_kernels():
    """kernels=True (TPU-only, fixed batch) keeps the pallas kernels: the
    serialized module must contain Mosaic tpu_custom_call sites (Mosaic
    lowering runs from a CPU-only exporting host)."""
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=2, schedule="cosine", eps=0.005)

    data = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior",
        batch=4, platforms=("tpu",), kernels=True,
    )
    header, payload = exporting.unpack_artifact(data)
    assert header["kernels"] is True and header["platforms"] == ["tpu"]
    assert header["custom_calls"] is True
    assert b"tpu_custom_call" in payload

    # below the measured batch crossover the gates still answer: a batch-1
    # kernels export correctly bakes NO custom-calls (and says so)
    data1 = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior",
        batch=1, platforms=("tpu",), kernels=True,
    )
    header1, payload1 = exporting.unpack_artifact(data1)
    assert header1["custom_calls"] is False
    assert b"tpu_custom_call" not in payload1

    # guard rails: cross-platform or symbolic-batch kernel exports refuse
    with pytest.raises(ValueError):
        exporting.export_restoration_sampler(
            sde, net.apply, params, (16, 16), batch=4,
            platforms=("cpu", "tpu"), kernels=True,
        )
    with pytest.raises(ValueError):
        exporting.export_restoration_sampler(
            sde, net.apply, params, (16, 16), batch=None,
            platforms=("tpu",), kernels=True,
        )


def test_export_latent_sampler(tmp_path):
    comp = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(1, 2), embed_dim=4)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 16, 16, 3))
    lat_params = jax.jit(comp.init)(key, img)
    encode_fn = lambda p, x: comp.apply(p, x, method=comp.encode)
    decode_fn = lambda p, l, h: comp.apply(p, l, h, method=comp.decode)
    lat, _ = encode_fn(lat_params, img)
    score = ConditionalNAFNet(img_channel=4, width=8, middle_blk_num=1,
                              enc_blk_nums=(1,), dec_blk_nums=(1,))
    sp = jax.jit(score.init)(key, lat, lat, jnp.zeros((1,)))
    sde = IRSDE.create(max_sigma=50.0, T=4, schedule="cosine", eps=0.005)

    data = exporting.export_latent_sampler(
        sde, score.apply, encode_fn, decode_fn, lat_params, sp, (16, 16),
        mode="sde", platforms=("cpu",),
    )
    call, header = exporting.load_artifact(data)
    assert header["kind"] == "latent_sampler"
    live = make_latent_sampler(sde, score.apply, encode_fn, decode_fn,
                               lat_params, mode="sde", chunk=0)
    lq = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
    got = call(lq, jnp.uint32(5))
    with no_pallas():
        want = live(sp, lq, jax.random.PRNGKey(jnp.uint32(5)))
    assert got.shape == lq.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4
    )


def test_export_denoising_sampler():
    """Gaussian-denoising artifacts share the (lq, seed) interface but run
    the deterministic optimal-t reverse ODE (seed ignored)."""
    from image_restoration_sde_tpu.sampling import make_denoising_sampler
    from image_restoration_sde_tpu.sde.denoising_sde import DenoisingSDE

    net = ConditionalNAFNet(img_channel=3, width=8, middle_blk_num=1,
                            enc_blk_nums=(1,), dec_blk_nums=(1,),
                            conditional=False)
    x = jnp.zeros((1, 16, 16, 3))
    apply_fn = lambda p, z, t: net.apply(p, z, None, t)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, None, jnp.array([1.0]))
    sde = DenoisingSDE.create(max_sigma=50.0, T=10)

    data = exporting.export_denoising_sampler(
        sde, apply_fn, params, (16, 16), sigma=25.0, platforms=("cpu",),
    )
    call, header = exporting.load_artifact(data)
    assert header["kind"] == "denoising_sampler" and header["sigma"] == 25.0
    noisy = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1 + 0.5
    got = call(noisy, jnp.uint32(0))
    live = make_denoising_sampler(sde, apply_fn, 25.0)
    with no_pallas():
        want = live(params, noisy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)
    # deterministic: the seed input must not matter
    np.testing.assert_array_equal(
        np.asarray(call(noisy, jnp.uint32(123))), np.asarray(got)
    )


def test_serve_http_roundtrip(tmp_path):
    """tools/serve.py loads an artifact and restores a POSTed PNG; /health
    returns the header; oversized inputs get a 400."""
    import urllib.error
    import urllib.request

    from PIL import Image

    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=2, schedule="cosine", eps=0.005)
    art = tmp_path / "m.irsdex"
    art.write_bytes(exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", platforms=("cpu",),
    ))

    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--artifact", str(art), "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        line = proc.stdout.readline()  # blocks until warmed + bound
        assert line.startswith("serving on "), line
        addr = line.strip().split()[-1]

        with urllib.request.urlopen(f"http://{addr}/health", timeout=60) as r:
            header = json.loads(r.read())
        assert header["kind"] == "restoration_sampler"
        # micro-batching caveat is surfaced, not just docstring'd
        assert header["serving"]["seed_reproducible"] is False

        # GET / serves the live web demo (the reference's gradio app.py
        # capability, stdlib-only): an upload form posting to /restore
        with urllib.request.urlopen(f"http://{addr}/", timeout=60) as r:
            page = r.read().decode()
            assert "text/html" in r.headers["Content-Type"]
        assert "/restore" in page and 'type="file"' in page

        rs = np.random.RandomState(0)
        img = (rs.rand(12, 14, 3) * 255).astype(np.uint8)  # smaller: pads
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://{addr}/restore?seed=3", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == img.shape and out.dtype == np.uint8

        big = io.BytesIO()
        Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8)).save(big, format="PNG")
        req = urllib.request.Request(
            f"http://{addr}/restore", data=big.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        proc.kill()
        proc.wait(timeout=30)


def test_export_cli(tmp_path):
    import yaml

    cfg = {
        "name": "exp-unit", "model": "denoising", "distortion": "derain",
        "gpu_ids": [0],
        "sde": {"max_sigma": 10, "T": 4, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "posterior"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
        "path": {"root": str(tmp_path / "run")},
    }
    opt_path = tmp_path / "exp.yml"
    yaml.safe_dump(cfg, open(opt_path, "w"))
    out = tmp_path / "m.irsdex"

    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         f"-opt={opt_path}", "--out", str(out), "--size", "16", "--check"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "check OK" in r.stdout
    assert out.exists()

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--inspect", str(out)],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    header = json.loads(r2.stdout)
    assert header["kind"] == "restoration_sampler"
    assert header["config"] == "exp-unit"


def test_export_cli_bf16_builds_bf16_compute_program(tmp_path):
    """--bf16 must rebuild the score net with bf16 COMPUTE, not only precast
    the params: flax promotes bf16 params x f32 features back to f32, so a
    precast-only program does double the HBM traffic of the live bf16
    operating point (measured +32%/call on TPU).  Observable in the traced
    StableHLO: activation-shaped (batch-leading) bf16 tensors exist."""
    import re

    import yaml

    cfg = {
        "name": "exp-bf16", "model": "denoising", "distortion": "derain",
        "gpu_ids": [0],
        "sde": {"max_sigma": 10, "T": 3, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "posterior"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
        "path": {"root": str(tmp_path / "run")},
    }
    opt_path = tmp_path / "exp.yml"
    yaml.safe_dump(cfg, open(opt_path, "w"))
    out = tmp_path / "m_bf16.irsdex"

    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         f"-opt={opt_path}", "--out", str(out), "--size", "16",
         "--batch", "2", "--bf16", "--sidecar", "--check"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "check OK" in r.stdout

    from jax import export as jexport

    with open(out, "rb") as f:
        header, payload = exporting.unpack_artifact(f.read())
    assert header["params"] == "sidecar"
    exp = jexport.deserialize(payload[: header["export_len"]])
    mlir = exp.mlir_module()
    # batch-leading 4D bf16 tensors are the net's activations (params have
    # no batch-2 leading dim at these shapes)
    assert re.search(r"tensor<2x16x16x\d+xbf16>", mlir), (
        "no bf16 activation tensors in the exported program — --bf16 "
        "exported an f32-compute net"
    )


# ------------------------------------------------- serving micro-batching
def _load_serve_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "irsde_serve", os.path.join(REPO, "tools", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_micro_batcher_fixed_batch_pads_and_routes():
    """3 concurrent requests against a fixed-batch-4 program ride ONE call,
    padded with a replica row; each caller gets its own row back."""
    serve = _load_serve_module()
    calls = []

    def fake_call(xs, seed):
        xs = np.asarray(xs)
        calls.append(xs.shape[0])
        return xs + 1.0

    mb = serve.MicroBatcher(fake_call, fixed=4, window_s=0.25)
    imgs = [np.full((2, 2, 3), i, np.float32) for i in range(3)]
    futs = [mb.submit(img, 0) for img in imgs]
    outs = [f.result(timeout=30) for f in futs]
    assert calls == [4]
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, imgs[i] + 1.0)


def test_micro_batcher_pow2_buckets_symbolic():
    """Symbolic-batch artifacts see pow2 batch sizes only (bounded compiles)."""
    serve = _load_serve_module()
    calls = []

    def fake_call(xs, seed):
        xs = np.asarray(xs)
        calls.append(xs.shape[0])
        return xs

    mb = serve.MicroBatcher(fake_call, fixed=None, max_batch=8, window_s=0.25)
    futs = [mb.submit(np.zeros((2, 2, 3), np.float32), 0) for _ in range(5)]
    for f in futs:
        f.result(timeout=30)
    assert calls == [8]  # 5 requests -> one bucket-8 call


def test_micro_batcher_nonpow2_cap_is_hard():
    """A non-pow2 --max-batch is still a hard cap: 5 pending requests pad to
    the cap bucket (6), never round up past it to 8."""
    serve = _load_serve_module()
    calls = []

    def fake_call(xs, seed):
        xs = np.asarray(xs)
        calls.append(xs.shape[0])
        return xs

    mb = serve.MicroBatcher(fake_call, fixed=None, max_batch=6, window_s=0.25)
    futs = [mb.submit(np.zeros((2, 2, 3), np.float32), 0) for _ in range(5)]
    for f in futs:
        f.result(timeout=30)
    assert calls == [6]


def test_micro_batcher_max_wait_dispatches_partial_batch():
    """With max_wait set, a request stuck behind a long-running device call
    dispatches as a partial batch at the deadline instead of collecting
    until the device frees up (the latency-bound serving mode)."""
    import time

    serve = _load_serve_module()
    t0 = time.monotonic()
    log = []  # (dispatch time, batch size)

    class SlowOut:  # completion blocks (models jax async dispatch), call returns fast
        def __init__(self, xs, delay):
            self.xs, self.delay = xs, delay

        def __array__(self, dtype=None, copy=None):
            time.sleep(self.delay)
            return self.xs

    def fake_call(xs, seed):
        xs = np.asarray(xs)
        log.append((time.monotonic() - t0, xs.shape[0]))
        return SlowOut(xs, 0.8 if len(log) == 1 else 0.0)

    mb = serve.MicroBatcher(fake_call, fixed=None, max_batch=4,
                            window_s=0.01, max_wait_s=0.1)
    f1 = mb.submit(np.zeros((1, 1, 3), np.float32), 0)
    time.sleep(0.05)  # batch 1 is in flight (completer blocked ~0.8s)
    f2 = mb.submit(np.zeros((1, 1, 3), np.float32), 0)
    f1.result(timeout=30)
    f2.result(timeout=30)
    assert len(log) == 2
    # the second dispatch happened at ~max_wait, NOT after the 0.8s call
    assert log[1][0] - log[0][0] < 0.5, log
    assert log[1][1] == 1  # partial batch (nothing else pending)


def test_micro_batcher_fans_out_failures():
    serve = _load_serve_module()

    def bad_call(xs, seed):
        raise RuntimeError("device fell over")

    mb = serve.MicroBatcher(bad_call, fixed=None, max_batch=2, window_s=0.05)
    fut = mb.submit(np.zeros((2, 2, 3), np.float32), 0)
    with pytest.raises(RuntimeError, match="device fell over"):
        fut.result(timeout=30)
    # the worker survives a failed batch and keeps serving
    ok = serve.MicroBatcher(lambda xs, s: np.asarray(xs), fixed=None,
                            max_batch=1, window_s=0.0)
    assert ok.submit(np.ones((1, 1, 3), np.float32), 0).result(timeout=30).shape == (1, 1, 3)


def test_serve_fixed_batch_artifact_concurrent(tmp_path):
    """A fixed-batch export (the kernels-artifact shape) is servable: two
    concurrent requests share one device call; /health reports the pin."""
    import threading
    import urllib.request

    from PIL import Image

    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=2, schedule="cosine", eps=0.005)
    art = tmp_path / "mb2.irsdex"
    art.write_bytes(exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", batch=2,
        platforms=("cpu",),
    ))

    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--artifact", str(art), "--port", "0", "--window-ms", "200"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        line = proc.stdout.readline()
        assert line.startswith("serving on "), line + proc.stderr.read()
        addr = line.strip().split()[-1]

        with urllib.request.urlopen(f"http://{addr}/health", timeout=60) as r:
            header = json.loads(r.read())
        assert header["serving"]["fixed_batch"] == 2
        assert header["serving"]["max_batch"] == 2

        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="PNG")
        body = buf.getvalue()
        results = [None, None]

        def post(i):
            req = urllib.request.Request(
                f"http://{addr}/restore?seed={i}", data=body, method="POST",
                headers={"Content-Type": "image/png"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = np.asarray(Image.open(io.BytesIO(r.read())))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for out in results:
            assert out is not None and out.shape == (16, 16, 3)
    finally:
        proc.kill()
        proc.wait(timeout=30)


# ----------------------------------------------------- sidecar weights mode
def test_export_sidecar_pixel_matches_baked(tmp_path):
    """Sidecar artifacts keep the program weight-free (bounded compile
    payloads) but serve identically: same (lq, seed) interface, same
    numerics as the baked artifact and the live sampler."""
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=4, schedule="cosine", eps=0.005)

    baked = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", platforms=("cpu",),
    )
    side = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", platforms=("cpu",),
        sidecar=True,
    )
    h = exporting.unpack_artifact(side)[0]
    assert h["params"] == "sidecar"
    # the program itself no longer carries the weights
    n_bytes = sum(4 * p.size for p in jax.tree.leaves(params))
    assert h["export_len"] < len(baked) - n_bytes // 2

    call_b, _ = exporting.load_artifact(baked)
    call_s, hdr = exporting.load_artifact(side)
    assert hdr["params"] == "sidecar"
    lq = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
    got_b = np.asarray(call_b(lq, jnp.uint32(5)))
    got_s = np.asarray(call_s(lq, jnp.uint32(5)))
    np.testing.assert_allclose(got_s, got_b, rtol=1e-5, atol=1e-4)


def test_export_sidecar_latent_and_dp_mesh(tmp_path):
    """Latent sidecar stores both nets' weights; load_artifact(mesh=) still
    data-parallelizes the batch with replicated sidecar weights."""
    from jax.sharding import Mesh

    net = ConditionalNAFNet(img_channel=4, width=8, middle_blk_num=1,
                            enc_blk_nums=(1,), dec_blk_nums=(1,))
    lnet = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(1, 2), embed_dim=4)
    lq = jnp.zeros((1, 16, 16, 3))
    lparams = jax.jit(lnet.init)(jax.random.PRNGKey(0), lq)
    encode = lambda p, x: lnet.apply(p, x, method=lnet.encode)
    decode = lambda p, z, skips: lnet.apply(p, z, skips, method=lnet.decode)
    z, _ = encode(lparams, lq)
    params = jax.jit(net.init)(
        jax.random.PRNGKey(1), jnp.zeros(z.shape), jnp.zeros(z.shape),
        jnp.array([1.0]),
    )
    sde = IRSDE.create(max_sigma=10.0, T=3, schedule="cosine", eps=0.005)

    side = exporting.export_latent_sampler(
        sde, net.apply, encode, decode, lparams, params, (16, 16),
        mode="posterior", platforms=("cpu",), sidecar=True,
    )
    call, hdr = exporting.load_artifact(side)
    assert hdr["params"] == "sidecar" and hdr["kind"] == "latent_sampler"
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    want = np.asarray(call(x, jnp.uint32(1)))
    assert want.shape == (2, 16, 16, 3) and np.isfinite(want).all()

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("data",))
    call_dp, _ = exporting.load_artifact(side, mesh=mesh)
    got = np.asarray(call_dp(x, jnp.uint32(1)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_export_bokeh_latent_sampler_bakes_lens():
    """Bokeh latent artifacts bake the lens tuple as program constants — the
    (lq, seed) interface carries no lens, matching the reference bokeh app's
    hardcoded lens params (ref config/latent-bokeh/app.py:31-33)."""
    from image_restoration_sde_tpu.models.bokeh_nafnet import BokehConditionalNAFNet

    comp = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(1, 2), embed_dim=4)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 16, 16, 3))
    lat_params = jax.jit(comp.init)(key, img)
    encode_fn = lambda p, x: comp.apply(p, x, method=comp.encode)
    decode_fn = lambda p, l, h: comp.apply(p, l, h, method=comp.decode)
    lat, _ = encode_fn(lat_params, img)
    score = BokehConditionalNAFNet(img_channel=4, width=8, middle_blk_num=1,
                                   enc_blk_nums=(1,), dec_blk_nums=(1,))
    lens1 = (jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1,)))
    sp = jax.jit(
        lambda k, x: score.init(k, x, x, jnp.zeros((1,)), lens_info=lens1)
    )(key, lat)
    # gamma residual scales init to zero, which gates the cam-modulated FFN
    # branch off entirely — un-gate so the lens conditioning is observable
    sp = jax.tree_util.tree_map_with_path(
        lambda path, a: jnp.ones_like(a) if "gamma" in str(path) else a, sp
    )
    sde = IRSDE.create(max_sigma=50.0, T=4, schedule="cosine", eps=0.005)

    def apply_with_lens(p, xt, cond_img, tvec, lens_tuple):
        return score.apply(p, xt, cond_img, tvec, lens_info=lens_tuple)

    lens = (18.0, 160.0, 35.0)
    data = exporting.export_latent_sampler(
        sde, apply_with_lens, encode_fn, decode_fn, lat_params, sp, (16, 16),
        mode="sde", platforms=("cpu",), cond=lens,
    )
    call, header = exporting.load_artifact(data)
    assert header["cond"] == [18.0, 160.0, 35.0]  # json: tuple -> list

    lq = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
    got = np.asarray(call(lq, jnp.uint32(5)))
    live = make_latent_sampler(sde, apply_with_lens, encode_fn, decode_fn,
                               lat_params, mode="sde", chunk=0)
    cond_b = tuple(jnp.full((2,), v, jnp.float32) for v in lens)
    with no_pallas():
        want = live(sp, lq, jax.random.PRNGKey(jnp.uint32(5)), cond_b)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-4)

    # a different lens bake changes the output — the conditioning is live
    data2 = exporting.export_latent_sampler(
        sde, apply_with_lens, encode_fn, decode_fn, lat_params, sp, (16, 16),
        mode="sde", platforms=("cpu",), cond=(50.0, 18.0, 5.0),
    )
    call2, _ = exporting.load_artifact(data2)
    assert np.abs(np.asarray(call2(lq, jnp.uint32(5))) - got).max() > 1e-4


def test_export_denoising_sampler_bf16_cast():
    """--bf16 denoising exports actually store bf16 params (the cast is
    threaded through export_denoising_sampler, not just the help text)."""
    from image_restoration_sde_tpu.sde.denoising_sde import DenoisingSDE

    net = ConditionalNAFNet(img_channel=3, width=8, middle_blk_num=1,
                            enc_blk_nums=(1,), dec_blk_nums=(1,),
                            conditional=False)
    x = jnp.zeros((1, 16, 16, 3))
    apply_fn = lambda p, z, t: net.apply(p, z, None, t)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, None, jnp.array([1.0]))
    sde = DenoisingSDE.create(max_sigma=50.0, T=6)

    data = exporting.export_denoising_sampler(
        sde, apply_fn, params, (16, 16), sigma=25.0, platforms=("cpu",),
        cast_params=jnp.bfloat16, sidecar=True,
    )
    header, payload = exporting.unpack_artifact(data)
    stored = exporting._deserialize_params(payload[int(header["export_len"]):])
    dtypes = {np.asarray(l).dtype for l in jax.tree.leaves(stored)}
    assert dtypes == {np.dtype(jnp.bfloat16)}, dtypes

    call, _ = exporting.load_artifact(data)
    noisy = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1 + 0.5
    out = np.asarray(call(noisy, jnp.uint32(0)))
    assert out.shape == noisy.shape and np.isfinite(out).all()


def test_export_per_sample_seed_reproducible():
    """--per-sample-seed artifacts take a uint32 (b,) seed vector and make
    row i a function of (lq[i], seeds[i]) ONLY: bit-identical under batch
    permutation and across different batch sizes of the same symbolic
    program — the property micro-batched serving reproducibility rests on
    (a scalar-seed batch ties every row to batch position)."""
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=4, schedule="cosine", eps=0.005)

    data = exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior",
        platforms=("cpu",), per_sample_seed=True,
    )
    call, header = exporting.load_artifact(data)
    assert header["seed"] == "per_sample"
    assert "uint32[b]" in header["in_avals"][1]

    lq = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3))
    seeds = jnp.array([5, 6, 7, 8], jnp.uint32)
    out = np.asarray(call(lq, seeds))
    # batch-position independence: permuted batch -> permuted rows, bitwise
    perm = np.array([2, 0, 3, 1])
    np.testing.assert_array_equal(
        np.asarray(call(lq[perm], seeds[perm])), out[perm]
    )
    # batch-composition independence: the same (image, seed) pair in a
    # DIFFERENT batch of a different size returns the same row — the noise
    # draws are identical by construction, but a different concrete batch
    # of the symbolic program is a separate XLA compilation (different
    # reduction tilings), so tight, not bitwise (fixed-batch artifacts
    # always run ONE shape and stay bitwise)
    out2 = np.asarray(call(jnp.stack([lq[2], lq[0]]),
                           jnp.array([7, 5], jnp.uint32)))
    np.testing.assert_allclose(out2[0], out[2], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out2[1], out[0], rtol=1e-5, atol=1e-4)
    # distinct seeds on the same image give distinct stochastic samples
    same = np.asarray(call(jnp.stack([lq[0], lq[0]]),
                           jnp.array([5, 99], jnp.uint32)))
    assert np.abs(same[0] - same[1]).max() > 0


def test_latent_sampler_per_sample_keys_chunk_invariant():
    """The live latent sampler accepts a per-sample key batch: chunked and
    unchunked sampling then draw IDENTICAL noise (per-sample streams make
    chunking a pure scheduling choice) and agree to XLA-recompilation
    tolerance (chunked/unchunked and different batch sizes are separate
    compilations with different reduction tilings — with one shared key a
    chunked run draws entirely DIFFERENT noise, so this is the property
    that makes chunking/batching invisible to results)."""
    comp = UNet(in_ch=3, out_ch=3, ch=8, ch_mult=(1, 2), embed_dim=4)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 16, 16, 3))
    lat_params = jax.jit(comp.init)(key, img)
    encode_fn = lambda p, x: comp.apply(p, x, method=comp.encode)
    decode_fn = lambda p, l, h: comp.apply(p, l, h, method=comp.decode)
    lat, _ = encode_fn(lat_params, img)
    score = ConditionalNAFNet(img_channel=4, width=8, middle_blk_num=1,
                              enc_blk_nums=(1,), dec_blk_nums=(1,))
    sp = jax.jit(score.init)(key, lat, lat, jnp.zeros((1,)))
    sde = IRSDE.create(max_sigma=50.0, T=4, schedule="cosine", eps=0.005)

    from image_restoration_sde_tpu.sde.rng import keys_for_seeds

    lq = jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 3))
    keys = keys_for_seeds(jnp.array([11, 12, 13, 14], jnp.uint32))
    whole = make_latent_sampler(sde, score.apply, encode_fn, decode_fn,
                                lat_params, mode="sde", chunk=0)
    chunked = make_latent_sampler(sde, score.apply, encode_fn, decode_fn,
                                  lat_params, mode="sde", chunk=2)
    with no_pallas():
        out = np.asarray(whole(sp, lq, keys))
        out_c = np.asarray(chunked(sp, lq, keys))
        out_pair = np.asarray(whole(
            sp, jnp.stack([lq[3], lq[1]]),
            keys_for_seeds(jnp.array([14, 12], jnp.uint32))))
    np.testing.assert_allclose(out_c, out, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out_pair[0], out[3], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out_pair[1], out[1], rtol=1e-5, atol=1e-4)


def test_micro_batcher_per_sample_seeds():
    """per_sample_seed batchers hand the program each rider's OWN seed (a
    uint32 vector, padded rows reusing the last rider's seed) instead of the
    first rider's scalar."""
    serve = _load_serve_module()
    seen = []

    def fake_call(xs, seeds):
        seeds = np.asarray(seeds)
        seen.append(seeds.copy())
        assert seeds.shape == (np.asarray(xs).shape[0],)
        return np.asarray(xs)

    mb = serve.MicroBatcher(fake_call, fixed=4, window_s=0.25,
                            per_sample_seed=True)
    futs = [mb.submit(np.zeros((2, 2, 3), np.float32), 10 + i)
            for i in range(3)]
    for f in futs:
        f.result(timeout=30)
    assert len(seen) == 1
    np.testing.assert_array_equal(seen[0], np.array([10, 11, 12, 12], np.uint32))


def test_serve_per_sample_seed_reproducible_over_http(tmp_path):
    """End-to-end reproducibility proof: with a --per-sample-seed fixed-batch
    artifact, identical (image, seed) requests return byte-identical PNGs no
    matter which concurrent batch they ride in (fixed batch shape = one XLA
    program = bitwise), while different seeds on the same image differ —
    the micro-batching determinism caveat is gone."""
    import threading
    import urllib.request

    from PIL import Image

    net = ConditionalUNet(in_nc=3, out_nc=3, nf=8, depth=2)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, jnp.array([1.0]))
    sde = IRSDE.create(max_sigma=10.0, T=2, schedule="cosine", eps=0.005)
    art = tmp_path / "psd2.irsdex"
    art.write_bytes(exporting.export_restoration_sampler(
        sde, net.apply, params, (16, 16), mode="posterior", batch=2,
        platforms=("cpu",), per_sample_seed=True,
    ))

    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--artifact", str(art), "--port", "0", "--window-ms", "200"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        line = proc.stdout.readline()
        assert line.startswith("serving on "), line + proc.stderr.read()
        addr = line.strip().split()[-1]

        with urllib.request.urlopen(f"http://{addr}/health", timeout=60) as r:
            header = json.loads(r.read())
        assert header["seed"] == "per_sample"
        assert header["serving"]["seed_reproducible"] is True

        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8)).save(
            buf, format="PNG")
        body = buf.getvalue()

        def post_pair(seeds):
            """Two concurrent requests -> one shared batch-2 device call."""
            out = [None, None]

            def post(i):
                req = urllib.request.Request(
                    f"http://{addr}/restore?seed={seeds[i]}", data=body,
                    method="POST", headers={"Content-Type": "image/png"},
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    out[i] = r.read()

            ts = [threading.Thread(target=post, args=(i,)) for i in range(2)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            return out

        a = post_pair((7, 3))   # seed 7 rides with seed 3
        b = post_pair((9, 7))   # seed 7 rides with seed 9, other position
        assert a[0] == b[1], "same (image, seed) must be byte-identical " \
                             "regardless of batch companion and position"
        assert a[0] != a[1] and a[0] != b[0], "different seeds must differ"
    finally:
        proc.kill()
        proc.wait(timeout=30)
