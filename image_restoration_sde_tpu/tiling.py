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
from typing import Callable, Tuple

import numpy as np


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
    for i in range(0, len(coords), tile_batch):
        chunk = tiles[i : i + tile_batch]
        pad = tile_batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
        restored = np.asarray(sample_fn(params, chunk, key))
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
