"""Tiled inference tests: grid coverage, seamlessness on identity samplers,
consistency with whole-image restoration for translation-invariant fns."""

import numpy as np
import pytest

from image_restoration_sde_tpu.tiling import tile_grid, tiled_restore


def test_tile_grid_covers():
    for L, t, o in [(100, 40, 8), (512, 128, 32), (40, 64, 16), (130, 64, 0)]:
        starts = tile_grid(L, min(t, L), o)
        covered = np.zeros(L, bool)
        for s in starts:
            covered[s : s + min(t, L)] = True
        assert covered.all(), (L, t, o)
        assert starts == sorted(set(starts))


def test_identity_sampler_reconstructs_exactly():
    rs = np.random.RandomState(0)
    img = rs.rand(1, 100, 140, 3).astype(np.float32)

    def sample_fn(params, tiles, key):
        return tiles

    out = tiled_restore(sample_fn, None, img, None, tile=48, overlap=16, tile_batch=3)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_translation_invariant_fn_is_seamless():
    # pointwise fn: tiling must be exactly equivalent, no seams
    rs = np.random.RandomState(1)
    img = rs.rand(1, 96, 96, 3).astype(np.float32)

    def sample_fn(params, tiles, key):
        return np.sqrt(tiles) * 0.7

    out = tiled_restore(sample_fn, None, img, None, tile=40, overlap=12)
    np.testing.assert_allclose(out, np.sqrt(img) * 0.7, atol=1e-5)


def test_fixed_tile_shape_for_all_calls():
    shapes = []

    def sample_fn(params, tiles, key):
        shapes.append(tiles.shape)
        return tiles

    img = np.zeros((1, 90, 130, 3), np.float32)
    tiled_restore(sample_fn, None, img, None, tile=64, overlap=16, tile_batch=2)
    assert len({s[1:] for s in shapes}) == 1  # single compiled tile shape
    assert len({s[0] for s in shapes}) == 1  # single batch shape


def test_pad_to_bucket_and_unpad():
    import jax.numpy as jnp

    from image_restoration_sde_tpu.sampling import pad_to_bucket, unpad

    x = np.random.RandomState(0).rand(1, 50, 70, 3).astype(np.float32)
    padded, hw = pad_to_bucket(x, 64)
    assert padded.shape == (1, 64, 128, 3) and hw == (50, 70)
    # reflect padding: no new extremes
    assert padded.min() >= x.min() and padded.max() <= x.max()
    back = np.asarray(unpad(jnp.asarray(padded), hw))
    np.testing.assert_array_equal(back, x)
    # already-aligned input is untouched
    y = np.zeros((1, 64, 64, 3), np.float32)
    p2, hw2 = pad_to_bucket(y, 64)
    assert p2 is y and hw2 == (64, 64)


def test_sampler_mode_validation():
    import jax.numpy as jnp
    import pytest as _pytest

    from image_restoration_sde_tpu.sampling import make_restoration_sampler
    from image_restoration_sde_tpu.sde import IRSDE

    sde = IRSDE.create(10.0, 4)
    with _pytest.raises(ValueError, match="sampling mode"):
        make_restoration_sampler(sde, lambda *a: None, mode="bogus")
