"""High-level restoration sampling API.

Replaces the reference's ``DenoisingModel.test`` dispatch
(ref denoising_model.py:150-160): start from the noised LQ
(``noise_state``), run the chosen reverse sampler, one jitted XLA program
for the full chain.

Dynamic test-time image sizes are handled by bucketed reflect padding
(``pad_to_bucket`` / ``unpad``): XLA wants static shapes, so shapes are
rounded up to a bucket multiple, and each bucket compiles once.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sde import IRSDE, samplers
from .sde.denoising_sde import DenoisingSDE

SAMPLING_MODES = ("sde", "posterior", "ode")


def cast_f32_leaves(tree, dtype):
    """Cast every f32 leaf to ``dtype`` (one-time, hoisted before the scan).

    At sampling time the score net re-reads its full parameter set every
    one of the T steps; for bf16-compute nets, feeding bf16 parameters
    halves that HBM traffic (and is numerically identical wherever the net
    already casts params to its compute dtype per op).  Opt-in: f32-math
    parameter islands (e.g. DiT's adaLN when dtype=f32) get rounded."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )


def _sample_chunk(batch: int, chunk: Optional[int]) -> int:
    """Sub-batch size the sampler scans over.

    On TPU the 100-step scan is fastest when the per-step working set stays
    inside XLA's fast-memory assignment (measured optimum: 8 images at
    128px on v5e; larger batches spill level-0 tensors to HBM and lose
    ~15%/image).  Chunking with ``lax.map`` keeps any batch at the
    per-chunk operating point.  Override with ``IRSDE_SAMPLE_CHUNK``.
    """
    if chunk is None:
        chunk = int(os.environ.get("IRSDE_SAMPLE_CHUNK", "8"))
    if chunk <= 0:
        return batch
    want = chunk
    while chunk > 1 and batch % chunk:
        chunk -= 1
    if chunk < max(1, want // 2):
        # batch coprime to the target (e.g. B=11): serializing into
        # near-batch-1 scans loses far more than the VMEM sweet spot wins
        return batch
    return min(chunk, batch)


def _batch_dim_sharded(lq) -> bool:
    """True iff the leading (batch) axis is actually *partitioned* across
    devices.  Chunking is a single-device VMEM-residency trick: a
    batch-sharded input is already at its per-device operating point and
    ``lax.map`` would serialize the devices' work — but a merely
    *replicated* multi-device input (multi-host validation) still holds
    the full batch per device and must keep chunking."""
    if isinstance(lq, jax.core.Tracer):
        # inside an enclosing trace (e.g. tiling.tiled_restore_device wraps
        # the sampler in its own jit): no concrete sharding to inspect, and
        # chunking remains the right per-device behavior
        return False
    if not (isinstance(lq, jax.Array) and hasattr(lq, "sharding")):
        return False
    sharding = lq.sharding
    if len(getattr(sharding, "device_set", ())) <= 1:
        return False
    try:
        return sharding.shard_shape(lq.shape)[0] < lq.shape[0]
    except Exception:
        return True  # unknown sharding type: don't risk serializing devices


def make_restoration_sampler(
    sde: IRSDE,
    apply_fn: Callable,  # (params, xt, cond, tvec) -> noise
    mode: str = "posterior",
    steps: Optional[int] = None,
    chunk: Optional[int] = None,
    cast_params=None,
) -> Callable:
    """Returns jitted ``sample(params, lq, key) -> restored`` (NHWC)."""
    if mode not in SAMPLING_MODES:
        raise ValueError(f"sampling mode {mode!r}; options: {SAMPLING_MODES}")

    def sample_one(params, lq, key):
        # key: one PRNGKey for the whole batch (production default), or a
        # (B, 2) per-sample key batch — sample i's noise then depends only
        # on key i, independent of batch composition and chunking (the
        # reproducible-serving path, exporting.py per_sample_seed)
        k_init, k_chain = samplers.split_key(key)
        noisy = sde.noise_state(k_init, lq)

        def noise_fn(x, mu, tvec):
            return apply_fn(params, x, mu, tvec)

        if mode == "sde":
            return samplers.reverse_sde(sde, noise_fn, noisy, lq, k_chain, steps=steps)
        if mode == "posterior":
            return samplers.reverse_posterior(sde, noise_fn, noisy, lq, k_chain, steps=steps)
        return samplers.reverse_ode(sde, noise_fn, noisy, lq, steps=steps)

    @partial(jax.jit, static_argnames="c")
    def _sample(params, lq, key, c):
        if cast_params is not None:
            params = cast_f32_leaves(params, cast_params)
        B = lq.shape[0]
        if c == B:
            return sample_one(params, lq, key)
        lqs = lq.reshape(B // c, c, *lq.shape[1:])
        if samplers.is_key_batch(key):
            keys = key.reshape(B // c, c, *key.shape[1:])  # rows follow lqs
        else:
            keys = jax.random.split(key, B // c)
        out = jax.lax.map(lambda a: sample_one(params, a[0], a[1]), (lqs, keys))
        return out.reshape(B, *out.shape[2:])

    def sample(params, lq, key):
        B = lq.shape[0]
        c = B if _batch_dim_sharded(lq) else _sample_chunk(B, chunk)
        return _sample(params, lq, key, c=c)

    return sample


def make_denoising_sampler(
    sde: DenoisingSDE,
    apply_fn: Callable,  # (params, x, tvec) -> noise
    sigma: float,
) -> Callable:
    """Denoising task: start the reverse ODE at the optimal timestep for the
    input noise level (ref config/denoising-sde/models/denoising_model.py:162-170)."""
    t0 = int(np.asarray(sde.get_optimal_timestep(sigma)))

    @jax.jit
    def sample(params, noisy):
        def noise_fn(x, tvec):
            return apply_fn(params, x, tvec)

        return samplers.dsde_reverse_ode(sde, noise_fn, noisy, steps=t0)

    return sample


# ------------------------------------------------- dynamic-shape bucketing
def pad_to_bucket(
    img: np.ndarray, multiple: int = 64
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Reflect-pad NHWC (bottom/right) to a bucket multiple; returns the
    original (H, W) for cropping back."""
    H, W = img.shape[1:3]
    ph = (multiple - H % multiple) % multiple
    pw = (multiple - W % multiple) % multiple
    if ph or pw:
        img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return img, (H, W)


def unpad(img: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    H, W = hw
    return img[:, :H, :W, :]
