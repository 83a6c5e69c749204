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


def test_device_tiling_matches_host_tiling():
    """tiled_restore_device = tiled_restore with the loop on-device: same
    grid, same feather, same outputs (f32 path; uint8 path to rounding)."""
    import jax.numpy as jnp

    from image_restoration_sde_tpu.tiling import tiled_restore_device

    rs = np.random.RandomState(2)
    img = rs.rand(1, 100, 140, 3).astype(np.float32)

    # a non-trivial, jit-traceable tile fn (affine + channel mix)
    mix = jnp.asarray(rs.rand(3, 3).astype(np.float32))

    def sample_fn(params, tiles, key):
        return jnp.einsum("bhwc,cd->bhwd", tiles, mix) * 0.5 + 0.1

    kw = dict(tile=48, overlap=16, tile_batch=3)
    host = tiled_restore(sample_fn, None, img, None, **kw)
    dev = tiled_restore_device(sample_fn, None, img, None, **kw)
    assert dev.dtype == np.float32
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_tiling_uint8_roundtrip():
    import jax.numpy as jnp

    from image_restoration_sde_tpu.tiling import tiled_restore_device

    rs = np.random.RandomState(3)
    img_u8 = (rs.rand(1, 70, 90, 3) * 255).astype(np.uint8)

    def sample_fn(params, tiles, key):
        return tiles  # identity: uint8 -> /255 -> blend -> *255 must round-trip

    out = tiled_restore_device(sample_fn, None, img_u8, None,
                               tile=40, overlap=12, tile_batch=2)
    assert out.dtype == np.uint8 and out.shape == img_u8.shape
    np.testing.assert_array_equal(out, img_u8)


def test_device_tiling_through_latent_sampler():
    """End-to-end: the real make_latent_sampler under tiled_restore_device
    (the sampler's chunk dispatch must be tracer-safe inside the outer jit)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_sde_tpu.models.latent_unet import UNet
    from image_restoration_sde_tpu.sde import IRSDE
    from image_restoration_sde_tpu.tiling import tiled_restore_device
    from image_restoration_sde_tpu.training.latent import make_latent_sampler

    sde = IRSDE.create(10.0, 3)
    comp = UNet(in_ch=3, out_ch=3, ch=4, ch_mult=(1, 2), embed_dim=4)
    key = jax.random.PRNGKey(0)
    lp = jax.jit(comp.init)(key, jnp.zeros((1, 16, 16, 3)))

    def encode_fn(p, x):
        return comp.apply(p, x, method=comp.encode)

    def decode_fn(p, l, h):
        return comp.apply(p, l, h, method=comp.decode)

    def score_apply(params, x, mu, t):
        return jnp.zeros_like(x)

    sampler = make_latent_sampler(sde, score_apply, encode_fn, decode_fn, lp)
    img = np.random.RandomState(4).rand(1, 24, 40, 3).astype(np.float32)
    out = tiled_restore_device(sampler, {}, img, key,
                               tile=16, overlap=4, tile_batch=2)
    assert out.shape == img.shape and np.isfinite(out).all()


def test_chunks_get_distinct_noise():
    """No two tile chunks may share PRNG draws (VERDICT r4 #3): a
    noise-sensitive sampler must produce different noise per chunk, and
    host/device tilers must agree on the folded keys."""
    import jax
    import jax.numpy as jnp

    from image_restoration_sde_tpu.tiling import tiled_restore, tiled_restore_device

    # pure-noise sampler: output IS the per-call noise realization
    def sample_fn(params, tiles, key):
        return jax.random.normal(key, tiles.shape, jnp.float32)

    img = np.zeros((1, 40, 20, 3), np.float32)
    key = jax.random.PRNGKey(7)
    # tile=20, overlap=0, tile_batch=1 -> 2 chunks stacked vertically, no blend
    host = tiled_restore(sample_fn, None, img, key, tile=20, overlap=0, tile_batch=1)
    top, bot = host[0, :20], host[0, 20:]
    assert np.abs(top - bot).max() > 1e-3, "chunks reused the same PRNG key"
    dev = tiled_restore_device(sample_fn, None, img, key,
                               tile=20, overlap=0, tile_batch=1)
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_run_is_cached_across_calls():
    """Repeated tiled_restore_device calls must reuse ONE jitted program
    (ADVICE r4: a fresh jax.jit wrapper per image retraces every call)."""
    from image_restoration_sde_tpu.tiling import tiled_restore_device

    traces = []

    def sample_fn(params, tiles, key):
        traces.append(1)  # runs once per trace, not per execution
        return tiles * 0.5

    img = np.random.RandomState(5).rand(1, 40, 60, 3).astype(np.float32)
    for _ in range(3):
        tiled_restore_device(sample_fn, None, img, None,
                             tile=32, overlap=8, tile_batch=2)
    assert len(traces) == 1, f"retraced {len(traces)} times for identical calls"


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
