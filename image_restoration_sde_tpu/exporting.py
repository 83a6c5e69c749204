"""AOT model export — serialized, versioned serving artifacts via jax.export.

The reference serves models from a live python+torch process (the gradio
``app.py`` and per-image ``test.py`` loops dispatch the score net 100x from
python per image).  The TPU-native deployment story is ahead-of-time export:
``jax.export`` serializes the *whole* jitted 100-step restoration program
(compressor/score net/scan/decode) to versioned StableHLO that

- loads and runs WITHOUT the model code or config system (one ``call``),
- pins the exact math of the build that produced it (schedule tables and
  weights are baked in as constants),
- lowers for several platforms in one artifact (``platforms=("cpu","tpu")``
  — exported on any host, served on TPU),
- supports a *symbolic batch dim*, so one artifact serves any request batch.

Artifact layout (single file): ``IRSDEX1\\n`` magic, 8-byte big-endian JSON
header length, UTF-8 JSON header (shapes, dtypes, platforms, build metadata),
then the ``jax.export`` payload.  The header is readable without jax.

Exported functions take ``(lq, seed)`` — image batch NHWC f32 in [0,1] and a
uint32 scalar seed (the PRNG key is derived inside the program; raw key
arrays are not a stable serving interface).  Kernel gates are forced off for
the export trace (``models.modules.no_pallas``): custom-calls don't lower
cross-platform, and a symbolic batch can't answer the batch>=N gate.
TPU-only artifacts at a concrete batch can keep them (``kernels=True`` —
Mosaic ``tpu_custom_call`` is jax.export-stable), preserving the measured
+41% batch-8 kernel win in the served program.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .models.modules import no_pallas
from .sampling import make_restoration_sampler
from .sde import IRSDE

MAGIC = b"IRSDEX1\n"


# ----------------------------------------------------------- artifact file
def pack_artifact(header: dict, payload: bytes) -> bytes:
    head = json.dumps(header, sort_keys=True).encode("utf-8")
    return MAGIC + struct.pack(">Q", len(head)) + head + payload


def unpack_artifact(data: bytes) -> Tuple[dict, bytes]:
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError("not an IRSDE export artifact (bad magic)")
    off = len(MAGIC)
    (hlen,) = struct.unpack(">Q", data[off : off + 8])
    off += 8
    header = json.loads(data[off : off + hlen].decode("utf-8"))
    return header, data[off + hlen :]


def read_header(path: str) -> dict:
    """Header only — no jax deserialization (cheap artifact inspection)."""
    with open(path, "rb") as f:
        data = f.read(1 << 20)
    return unpack_artifact(data)[0]


# ------------------------------------------------------- sidecar weights
def _serialize_params(params) -> bytes:
    """Flax msgpack of the params pytree (handles bf16 leaves)."""
    import numpy as np
    from flax import serialization

    return serialization.msgpack_serialize(
        jax.tree.map(lambda a: np.asarray(a), params)
    )


def _deserialize_params(blob: bytes):
    from flax import serialization

    return serialization.msgpack_restore(blob)


# ------------------------------------------------------------------ export
def _seed_to_key(per_sample: bool):
    """Seed-input -> PRNG key(s) for the exported serve fn.  Scalar seeds
    derive ONE key for the whole batch (each image still draws distinct
    noise by batch position); a per-sample ``(b,)`` seed vector derives a
    key PER SAMPLE (sde/rng.py), making each output row a function of its
    own (image, seed) only — bit-reproducible micro-batched serving."""
    if per_sample:
        from .sde.rng import keys_for_seeds

        return keys_for_seeds
    return jax.random.PRNGKey


def _seed_spec(per_sample: bool, b):
    return jax.ShapeDtypeStruct((b,) if per_sample else (), jnp.uint32)


def _precast(params, cast_params):
    """Apply the cast-params optimization HOST-SIDE before baking: a cast
    inside the exported program would bake the f32 constants anyway (the
    flagship artifact stays 549 MB); casting first halves the artifact AND
    the served program's per-step parameter reads."""
    if cast_params is None:
        return params, None
    from .sampling import cast_f32_leaves

    return jax.jit(lambda p: cast_f32_leaves(p, cast_params))(params), None


def export_fn(
    fn: Callable,
    arg_specs: Sequence[Any],
    *,
    platforms: Sequence[str] = ("cpu", "tpu"),
    kernels: bool = False,
    meta: Optional[dict] = None,
    sidecar_params=None,
) -> bytes:
    """Export an arbitrary jittable ``fn`` at ``arg_specs``
    (ShapeDtypeStructs, symbolic dims allowed) into a packed artifact.

    ``kernels=True`` keeps the pallas kernels in the artifact (Mosaic
    ``tpu_custom_call`` is on jax.export's guaranteed-stable list, and
    Mosaic lowering runs fine from a CPU-only exporting host —
    ``kernel_gate.force_pallas`` overrides the gates' *backend* checks
    only).  Requires a TPU-only platform list and concrete (non-symbolic)
    arg shapes: the measured batch>=N crossover gates still answer at
    trace time, so the artifact makes the same kernel choices the live
    TPU sampler would at that batch (a batch-1 --kernels export correctly
    bakes none).

    ``sidecar_params``: store this params pytree in the artifact file
    *beside* the program instead of baking it into the StableHLO — ``fn``
    must then take the params as its first argument, and ``arg_specs``
    must NOT include them (their specs are derived here).  Sidecar keeps
    the serialized program small (MBs, not the weights' hundreds of MBs):
    weights travel as ordinary runtime device buffers, so compile payloads
    stay bounded (remote-compile transports cap request sizes) and a
    loading host can shard or re-cast them.  The serving interface after
    ``load_artifact`` is identical — params are rebound internally."""
    from jax import export as jexport

    from .kernel_gate import force_pallas

    if kernels and tuple(platforms) != ("tpu",):
        raise ValueError("kernels=True requires platforms=('tpu',) — "
                         "custom-calls don't lower cross-platform")
    if sidecar_params is not None:
        pspecs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), sidecar_params
        )
        arg_specs = (pspecs, *arg_specs)
    ctx = force_pallas() if kernels else no_pallas()
    with ctx:
        exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*arg_specs)
    payload = exp.serialize()
    header = {
        "format": "jax.export",
        "platforms": list(platforms),
        "kernels": bool(kernels),
        # what actually got baked: kernels=True at a batch below the
        # measured crossover correctly gates everything off
        "custom_calls": bool(kernels) and b"tpu_custom_call" in payload,
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "jax_version": jax.__version__,
        **(meta or {}),
    }
    if sidecar_params is not None:
        header["params"] = "sidecar"
        header["export_len"] = len(payload)
        payload = payload + _serialize_params(sidecar_params)
    return pack_artifact(header, payload)


def export_restoration_sampler(
    sde: IRSDE,
    apply_fn: Callable,  # (params, xt, cond, tvec) -> noise
    params: Any,
    size: Tuple[int, int],
    *,
    mode: str = "posterior",
    steps: Optional[int] = None,
    channels: int = 3,
    batch: Optional[int] = None,  # None => symbolic batch dim
    platforms: Sequence[str] = ("cpu", "tpu"),
    kernels: bool = False,
    cast_params=None,
    sidecar: bool = False,
    per_sample_seed: bool = False,
    meta: Optional[dict] = None,
) -> bytes:
    """Bake ``params`` into a self-contained restoration-serving artifact.

    The exported program is ``restored = call(lq, seed)`` over the full
    reverse chain (ref test-time flow: config/deraining/test.py:70-120 +
    sde_utils.py reverse loop — here one compiled program).  ``batch=None``
    exports a symbolic batch dim; chunking is disabled (the serving host
    picks its own operating-point batch per request).  ``sidecar=True``
    stores the weights beside the program instead of inside it (see
    ``export_fn``) — same one-file artifact, same ``call(lq, seed)``.

    ``per_sample_seed=True`` exports ``call(lq, seeds)`` with a uint32
    ``(b,)`` seed VECTOR: sample i's noise is a function of seeds[i] ONLY
    (per-sample key streams, sde/rng.py), so identical ``(image, seed)``
    requests are bit-reproducible under micro-batched serving regardless
    of batch composition or position — the network still runs batch-level
    (kernel gates unaffected).  Header records ``seed: per_sample``.
    """
    from jax import export as jexport

    params, cast_params = _precast(params, cast_params)
    sampler = make_restoration_sampler(
        sde, apply_fn, mode=mode, steps=steps, chunk=0, cast_params=cast_params
    )
    to_key = _seed_to_key(per_sample_seed)

    if sidecar:
        def serve(p, lq, seed):
            return sampler(p, lq, to_key(seed))
    else:
        def serve(lq, seed):
            return sampler(params, lq, to_key(seed))

    if batch is None:
        if kernels:
            raise ValueError("kernels=True needs a concrete batch "
                             "(the batch>=N gates can't answer a symbolic dim)")
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    H, W = size
    specs = (
        jax.ShapeDtypeStruct((b, H, W, channels), jnp.float32),
        _seed_spec(per_sample_seed, b),
    )
    info = {
        "kind": "restoration_sampler",
        "mode": mode,
        "steps": int(steps if steps is not None else sde.T),
        "size": [H, W],
        "channels": channels,
        "batch": "symbolic" if batch is None else int(batch),
        "seed": "per_sample" if per_sample_seed else "scalar",
        "n_params": int(sum(p.size for p in jax.tree.leaves(params))),
        **(meta or {}),
    }
    return export_fn(serve, specs, platforms=platforms, kernels=kernels,
                     meta=info, sidecar_params=params if sidecar else None)


def export_denoising_sampler(
    sde,  # DenoisingSDE
    apply_fn: Callable,  # (params, x, tvec) -> noise
    params: Any,
    size: Tuple[int, int],
    sigma: float,
    *,
    channels: int = 3,
    batch: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    kernels: bool = False,
    cast_params=None,
    sidecar: bool = False,
    meta: Optional[dict] = None,
) -> bytes:
    """Gaussian-denoising artifact: reverse ODE from the optimal timestep
    for ``sigma`` (ref denoising-sde denoising_model.py:162-170).  The
    ``seed`` input is accepted but unused (deterministic ODE) so every
    artifact kind shares the ``call(lq, seed)`` interface."""
    from jax import export as jexport

    from .sampling import make_denoising_sampler

    params, cast_params = _precast(params, cast_params)
    sampler = make_denoising_sampler(sde, apply_fn, sigma)

    if sidecar:
        def serve(p, noisy, seed):
            del seed  # deterministic reverse ODE; interface uniformity only
            return sampler(p, noisy)
    else:
        def serve(noisy, seed):
            del seed  # deterministic reverse ODE; interface uniformity only
            return sampler(params, noisy)

    if batch is None:
        if kernels:
            raise ValueError("kernels=True needs a concrete batch "
                             "(the batch>=N gates can't answer a symbolic dim)")
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    H, W = size
    specs = (
        jax.ShapeDtypeStruct((b, H, W, channels), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.uint32),
    )
    info = {
        "kind": "denoising_sampler",
        "sigma": float(sigma),
        "size": [H, W],
        "channels": channels,
        "batch": "symbolic" if batch is None else int(batch),
        "seed": "ignored",  # deterministic reverse ODE — trivially reproducible
        "n_params": int(sum(p.size for p in jax.tree.leaves(params))),
        **(meta or {}),
    }
    return export_fn(serve, specs, platforms=platforms, kernels=kernels,
                     meta=info, sidecar_params=params if sidecar else None)


def export_latent_sampler(
    sde: IRSDE,
    model_apply: Callable,
    encode_fn: Callable,
    decode_fn: Callable,
    latent_params: Any,
    params: Any,
    size: Tuple[int, int],
    *,
    mode: str = "sde",
    steps: Optional[int] = None,
    batch: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    kernels: bool = False,
    cast_params=None,
    cond=None,
    sidecar: bool = False,
    per_sample_seed: bool = False,
    meta: Optional[dict] = None,
) -> bytes:
    """Refusion artifact: compressor encode -> latent reverse SDE -> decode,
    one program with both networks' weights in one file (ref latent-dehazing
    test flow, latent_denoising_model.py test()).  ``sidecar=True`` stores
    ``{"score": params, "latent": latent_params}`` beside the program.

    ``cond``: optional pytree of python floats baked into the program as
    per-sample conditioning constants (broadcast to the batch) — how bokeh
    latent models export: the ``(src_lens, tgt_lens, disparity)`` tuple is
    frozen at export time, matching the reference bokeh app's hardcoded
    lens params (ref config/latent-bokeh/app.py:31-33).

    ``per_sample_seed``: see ``export_restoration_sampler`` — ``call(lq,
    seeds)`` with a uint32 ``(b,)`` vector, row i reproducible from
    seeds[i] alone."""
    from jax import export as jexport

    from .training.latent import make_latent_sampler

    def _cond_for(lq):
        if cond is None:
            return None
        return jax.tree.map(
            lambda v: jnp.full((lq.shape[0],), v, jnp.float32), cond
        )

    params, cast_params = _precast(params, cast_params)
    sampler = make_latent_sampler(
        sde, model_apply, encode_fn, decode_fn, latent_params,
        mode=mode, steps=steps, cast_params=cast_params, chunk=0,
    )
    to_key = _seed_to_key(per_sample_seed)

    if sidecar:
        def serve(p, lq, seed):
            # rebuild the sampler around the traced compressor params (the
            # module-level one closed over the concrete latent_params)
            smp = make_latent_sampler(
                sde, model_apply, encode_fn, decode_fn, p["latent"],
                mode=mode, steps=steps, cast_params=cast_params, chunk=0,
            )
            return smp(p["score"], lq, to_key(seed), _cond_for(lq))
    else:
        def serve(lq, seed):
            return sampler(params, lq, to_key(seed), _cond_for(lq))

    if batch is None:
        if kernels:
            raise ValueError("kernels=True needs a concrete batch "
                             "(the batch>=N gates can't answer a symbolic dim)")
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    H, W = size
    specs = (
        jax.ShapeDtypeStruct((b, H, W, 3), jnp.float32),
        _seed_spec(per_sample_seed, b),
    )
    info = {
        "kind": "latent_sampler",
        "mode": mode,
        "steps": int(steps if steps is not None else sde.T),
        "size": [H, W],
        "batch": "symbolic" if batch is None else int(batch),
        "seed": "per_sample" if per_sample_seed else "scalar",
        "n_params": int(
            sum(p.size for p in jax.tree.leaves((params, latent_params)))
        ),
        **({"cond": jax.tree.map(float, cond)} if cond is not None else {}),
        **(meta or {}),
    }
    side = {"score": params, "latent": latent_params} if sidecar else None
    return export_fn(serve, specs, platforms=platforms, kernels=kernels,
                     meta=info, sidecar_params=side)


# -------------------------------------------------------------------- load
def load_artifact(data_or_path, mesh=None) -> Tuple[Callable, dict]:
    """Returns ``(call, header)``.  ``call(lq, seed)`` runs the exported
    program on the current default platform (must be in header["platforms"]).

    Sidecar artifacts (``header["params"] == "sidecar"``) are rebound here:
    the stored weights become runtime device buffers passed on every call —
    the external interface stays ``call(lq, seed)``.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis turns one
    symbolic-batch artifact into a data-parallel server — the call is
    re-jitted with the batch sharded over ``data`` (and sidecar weights
    replicated); verified equal to the single-device call in
    tests/test_export.py."""
    from jax import export as jexport

    if isinstance(data_or_path, (bytes, bytearray)):
        data = bytes(data_or_path)
    else:
        with open(data_or_path, "rb") as f:
            data = f.read()
    header, payload = unpack_artifact(data)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        rep_sh = NamedSharding(mesh, PartitionSpec())

    if header.get("params") == "sidecar":
        cut = int(header["export_len"])
        exp = jexport.deserialize(payload[:cut])
        params = _deserialize_params(payload[cut:])
        if mesh is not None:
            params = jax.device_put(params, rep_sh)
            jcall = jax.jit(exp.call, in_shardings=(rep_sh, batch_sh, None),
                            out_shardings=batch_sh)
        else:
            params = jax.device_put(params)
            jcall = jax.jit(exp.call)

        def call(lq, seed):
            # params go through as arguments (buffers), never as program
            # constants — compile payloads stay weight-free
            return jcall(params, lq, seed)

        return call, header

    exp = jexport.deserialize(payload)
    call = exp.call
    if mesh is not None:
        call = jax.jit(exp.call, in_shardings=(batch_sh, None),
                       out_shardings=batch_sh)
    return call, header
