"""Tiled restoration for images larger than device memory / compiled shapes.

The reference's answer to 4K-class inputs is Refusion's latent compression
plus full-image inference (SURVEY §5.7); SURVEY §7.10 lists tiled latent
inference as the stretch extension — implemented here generically: the image
is split into overlapping tiles, every tile runs through the *same* compiled
sampler (one bucket shape → one compile), and tiles are blended with a
separable raised-cosine feather so seams vanish.

Works with any ``sample_fn(params, lq_tiles, key) -> restored_tiles``
(pixel-space or latent pipeline); tiles are batched up to ``tile_batch`` to
fill the chip.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Callable, Tuple

import numpy as np


def _fold_key(key, idx: int):
    """Per-chunk PRNG key: fold the chunk index in so no two tile chunks
    share noise draws (a shared key paints a grid-correlated noise pattern
    across the tile lattice). ``None`` keys (deterministic samplers) pass
    through untouched."""
    if key is None:
        return None
    import jax

    return jax.random.fold_in(key, idx)


def _feather_profile(size: int, overlap: int) -> np.ndarray:
    """1-D blend weights: raised-cosine ramps across the overlap bands."""
    w = np.ones(size, dtype=np.float32)
    if overlap > 0:
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(overlap) + 0.5) / overlap)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def tile_grid(length: int, tile: int, overlap: int):
    """Start offsets covering [0, length) with ``tile``-sized windows."""
    if length <= tile:
        return [0]
    stride = tile - overlap
    n = math.ceil((length - tile) / stride) + 1
    starts = [min(i * stride, length - tile) for i in range(n)]
    # dedupe while keeping order (the clamp can repeat the last start)
    seen, out = set(), []
    for s in starts:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def tiled_restore(
    sample_fn: Callable,
    params,
    lq: np.ndarray,
    key,
    tile: int = 512,
    overlap: int = 64,
    tile_batch: int = 4,
) -> np.ndarray:
    """Restore an NHWC batch-1 image by overlapping tiles.

    ``sample_fn(params, tiles, key) -> tiles`` must accept a fixed tile
    shape; edge tiles are shifted inward (not padded) so every call shares
    one compiled shape.
    """
    assert lq.shape[0] == 1, "tiled_restore operates on batch-1 images"
    _, H, W, C = lq.shape
    tile_h = min(tile, H)
    tile_w = min(tile, W)
    ys = tile_grid(H, tile_h, overlap)
    xs = tile_grid(W, tile_w, overlap)

    coords = [(y, x) for y in ys for x in xs]
    tiles = np.concatenate(
        [lq[:, y : y + tile_h, x : x + tile_w, :] for (y, x) in coords], axis=0
    )

    outs = []
    for ci, i in enumerate(range(0, len(coords), tile_batch)):
        chunk = tiles[i : i + tile_batch]
        pad = tile_batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
        restored = np.asarray(sample_fn(params, chunk, _fold_key(key, ci)))
        outs.append(restored[: tile_batch - pad] if pad else restored)
    restored_tiles = np.concatenate(outs, axis=0)

    wy = _feather_profile(tile_h, min(overlap, tile_h // 2))
    wx = _feather_profile(tile_w, min(overlap, tile_w // 2))
    weight2d = (wy[:, None] * wx[None, :])[..., None]

    acc = np.zeros((H, W, C), dtype=np.float64)
    norm = np.zeros((H, W, 1), dtype=np.float64)
    for t_img, (y, x) in zip(restored_tiles, coords):
        acc[y : y + tile_h, x : x + tile_w] += t_img * weight2d
        norm[y : y + tile_h, x : x + tile_w] += weight2d
    return (acc / np.maximum(norm, 1e-8)).astype(np.float32)[None]


def tiled_restore_device(
    sample_fn: Callable,
    params,
    lq: np.ndarray,
    key,
    tile: int = 512,
    overlap: int = 64,
    tile_batch: int = 4,
) -> np.ndarray:
    """``tiled_restore`` with the whole tile loop as ONE device program.

    The host version round-trips every tile batch through host memory —
    fine on a local PCIe chip, ruinous when the device link is thin (a
    6000x4000 restore moves ~700 MB through the link; measured 68 s/image
    through the axon tunnel vs ~3 s of compute, BENCH.md).  Here the image
    is uploaded once (uint8 if given uint8: 4x less traffic), tiles are
    ``dynamic_slice``d, sampled chunk-by-chunk under ``lax.map``, and
    feather-blended into an on-device accumulator; one download returns the
    finished image.  uint8 in -> uint8 out (round/clip), f32 in -> f32 out.

    Same tile grid, same feather math as ``tiled_restore`` — outputs match
    to accumulation order (exactness-tested in tests/test_tiling.py).
    """
    assert lq.shape[0] == 1, "tiled_restore_device operates on batch-1 images"
    _, H, W, C = lq.shape
    tile_h = min(tile, H)
    tile_w = min(tile, W)
    ys = tile_grid(H, tile_h, overlap)
    xs = tile_grid(W, tile_w, overlap)
    coords = [(y, x) for y in ys for x in xs]
    n = len(coords)
    n_chunks = math.ceil(n / tile_batch)
    # pad the coord list with repeats of the last tile; their weight is 0
    pad = n_chunks * tile_batch - n
    coords_arr = np.asarray(coords + [coords[-1]] * pad, np.int32)
    valid = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    coords_c = coords_arr.reshape(n_chunks, tile_batch, 2)
    valid_c = valid.reshape(n_chunks, tile_batch)

    wy = _feather_profile(tile_h, min(overlap, tile_h // 2))
    wx = _feather_profile(tile_w, min(overlap, tile_w // 2))
    weight2d = (wy[:, None] * wx[None, :])[..., None]  # (th, tw, 1)

    import jax.numpy as jnp

    run = _build_device_run(sample_fn, tile_h, tile_w, tile_batch)
    out_uint8 = lq.dtype == np.uint8
    return np.asarray(
        run(params, jnp.asarray(lq), key, jnp.asarray(coords_c),
            jnp.asarray(valid_c), jnp.asarray(weight2d), out_uint8)
    )


@lru_cache(maxsize=16)
def _build_device_run(sample_fn: Callable, tile_h: int, tile_w: int,
                      tile_batch: int):
    """One jitted tile-loop program per (sample_fn, tile geometry).

    Cached at module level so repeated calls (e.g. tools/test.py restoring a
    directory of same-sized images) hit the SAME `jax.jit` wrapper and its
    trace cache — a fresh wrapper per image would retrace and re-lower the
    whole N-step tile loop every call.  Image H/W/C and the coord arrays are
    ordinary traced arguments, so different image sizes still share the
    wrapper (each size compiles once, as jit always does).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("out_uint8",))
    def run(params, img, key, cds, vld, w2d, out_uint8):
        _, H, W, C = img.shape
        x = (img.astype(jnp.float32) / 255.0) if out_uint8 else img

        def chunk_body(acc_norm, chunk):
            acc, norm = acc_norm
            cd, v, ci = chunk
            tiles = jax.vmap(
                lambda c: jax.lax.dynamic_slice(
                    x[0], (c[0], c[1], 0), (tile_h, tile_w, C)
                )
            )(cd)
            ck = key if key is None else jax.random.fold_in(key, ci)
            out = sample_fn(params, tiles, ck)

            def add_one(i, an):
                a, nrm = an
                w = w2d * v[i]
                yx = (cd[i, 0], cd[i, 1], 0)
                patch = jax.lax.dynamic_slice(a, yx, (tile_h, tile_w, C))
                npatch = jax.lax.dynamic_slice(nrm, yx, (tile_h, tile_w, 1))
                a = jax.lax.dynamic_update_slice(a, patch + out[i] * w, yx)
                nrm = jax.lax.dynamic_update_slice(nrm, npatch + w, yx)
                return a, nrm

            acc, norm = jax.lax.fori_loop(0, tile_batch, add_one, (acc, norm))
            return (acc, norm), None

        init = (jnp.zeros((H, W, C), jnp.float32), jnp.zeros((H, W, 1), jnp.float32))
        n_chunks = cds.shape[0]
        (acc, norm), _ = jax.lax.scan(
            chunk_body, init, (cds, vld, jnp.arange(n_chunks, dtype=jnp.int32))
        )
        out = acc / jnp.maximum(norm, 1e-8)
        if out_uint8:
            out = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return out[None]

    return run
