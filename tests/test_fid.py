"""FID math parity: the from-scratch JAX InceptionV3 (pool3 features) vs a
hand-rolled torch forward of the SAME randomized weights, plus the Fréchet
distance formula against closed forms.  The reference publishes FID
(ref README.md:46) but ships no code for it — the external pytorch-fid tool
defines the math this module pins (incl. its count_include_pad=False pools
and the Mixed_7c max-pool quirk)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from image_restoration_sde_tpu.utils import fid as jfid  # noqa: E402


# ------------------------------------------------- layer shapes (OIHW)
_STEM_SHAPES = {
    "Conv2d_1a_3x3": (32, 3, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (64, 32, 3, 3),
    "Conv2d_3b_1x1": (80, 64, 1, 1),
    "Conv2d_4a_3x3": (192, 80, 3, 3),
}


def _a(in_ch, pf):
    return {
        "branch1x1": (64, in_ch, 1, 1),
        "branch5x5_1": (48, in_ch, 1, 1),
        "branch5x5_2": (64, 48, 5, 5),
        "branch3x3dbl_1": (64, in_ch, 1, 1),
        "branch3x3dbl_2": (96, 64, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
        "branch_pool": (pf, in_ch, 1, 1),
    }


def _b(in_ch):
    return {
        "branch3x3": (384, in_ch, 3, 3),
        "branch3x3dbl_1": (64, in_ch, 1, 1),
        "branch3x3dbl_2": (96, 64, 3, 3),
        "branch3x3dbl_3": (96, 96, 3, 3),
    }


def _c(in_ch, c7):
    return {
        "branch1x1": (192, in_ch, 1, 1),
        "branch7x7_1": (c7, in_ch, 1, 1),
        "branch7x7_2": (c7, c7, 1, 7),
        "branch7x7_3": (192, c7, 7, 1),
        "branch7x7dbl_1": (c7, in_ch, 1, 1),
        "branch7x7dbl_2": (c7, c7, 7, 1),
        "branch7x7dbl_3": (c7, c7, 1, 7),
        "branch7x7dbl_4": (c7, c7, 7, 1),
        "branch7x7dbl_5": (192, c7, 1, 7),
        "branch_pool": (192, in_ch, 1, 1),
    }


def _d(in_ch):
    return {
        "branch3x3_1": (192, in_ch, 1, 1),
        "branch3x3_2": (320, 192, 3, 3),
        "branch7x7x3_1": (192, in_ch, 1, 1),
        "branch7x7x3_2": (192, 192, 1, 7),
        "branch7x7x3_3": (192, 192, 7, 1),
        "branch7x7x3_4": (192, 192, 3, 3),
    }


def _e(in_ch):
    return {
        "branch1x1": (320, in_ch, 1, 1),
        "branch3x3_1": (384, in_ch, 1, 1),
        "branch3x3_2a": (384, 384, 1, 3),
        "branch3x3_2b": (384, 384, 3, 1),
        "branch3x3dbl_1": (448, in_ch, 1, 1),
        "branch3x3dbl_2": (384, 448, 3, 3),
        "branch3x3dbl_3a": (384, 384, 1, 3),
        "branch3x3dbl_3b": (384, 384, 3, 1),
        "branch_pool": (192, in_ch, 1, 1),
    }


def _all_shapes():
    shapes = dict(_STEM_SHAPES)
    for blk, in_ch, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                           ("Mixed_5d", 288, 64)):
        shapes.update({f"{blk}.{k}": v for k, v in _a(in_ch, pf).items()})
    shapes.update({f"Mixed_6a.{k}": v for k, v in _b(288).items()})
    for blk, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                    ("Mixed_6d", 160), ("Mixed_6e", 192)):
        shapes.update({f"{blk}.{k}": v for k, v in _c(768, c7).items()})
    shapes.update({f"Mixed_7a.{k}": v for k, v in _d(768).items()})
    for blk, in_ch in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        shapes.update({f"{blk}.{k}": v for k, v in _e(in_ch).items()})
    return shapes


def _random_state_dict(seed=0):
    """Random weights under the exact torchvision/pytorch-fid key naming,
    scaled so activations stay O(1) through all 94 convs."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, (o, i, kh, kw) in _all_shapes().items():
        fan_in = i * kh * kw
        sd[f"{name}.conv.weight"] = torch.randn(o, i, kh, kw, generator=g) / np.sqrt(fan_in)
        sd[f"{name}.bn.weight"] = 0.8 + 0.4 * torch.rand(o, generator=g)
        sd[f"{name}.bn.bias"] = 0.05 * torch.randn(o, generator=g)
        sd[f"{name}.bn.running_mean"] = 0.05 * torch.randn(o, generator=g)
        sd[f"{name}.bn.running_var"] = 0.8 + 0.4 * torch.rand(o, generator=g)
    return sd


# -------------------------------------------------------- torch oracle
def _torch_pool3(sd, x):
    """Straight-line torch forward of the pytorch-fid InceptionV3 feature
    extractor (count_include_pad=False avg pools; Mixed_7c max-pool)."""

    def bc(name, h, stride=1, pad=(0, 0)):
        h = F.conv2d(h, sd[f"{name}.conv.weight"], stride=stride, padding=pad)
        h = F.batch_norm(h, sd[f"{name}.bn.running_mean"],
                         sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                         sd[f"{name}.bn.bias"], False, eps=1e-3)
        return F.relu(h)

    def avgp(h):
        return F.avg_pool2d(h, 3, 1, 1, count_include_pad=False)

    def blk_a(b, h):
        b1 = bc(f"{b}.branch1x1", h)
        b5 = bc(f"{b}.branch5x5_2", bc(f"{b}.branch5x5_1", h), pad=(2, 2))
        bd = bc(f"{b}.branch3x3dbl_1", h)
        bd = bc(f"{b}.branch3x3dbl_2", bd, pad=(1, 1))
        bd = bc(f"{b}.branch3x3dbl_3", bd, pad=(1, 1))
        return torch.cat([b1, b5, bd, bc(f"{b}.branch_pool", avgp(h))], 1)

    def blk_b(b, h):
        b3 = bc(f"{b}.branch3x3", h, stride=2)
        bd = bc(f"{b}.branch3x3dbl_1", h)
        bd = bc(f"{b}.branch3x3dbl_2", bd, pad=(1, 1))
        bd = bc(f"{b}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(h, 3, 2)], 1)

    def blk_c(b, h):
        b1 = bc(f"{b}.branch1x1", h)
        b7 = bc(f"{b}.branch7x7_1", h)
        b7 = bc(f"{b}.branch7x7_2", b7, pad=(0, 3))
        b7 = bc(f"{b}.branch7x7_3", b7, pad=(3, 0))
        bd = bc(f"{b}.branch7x7dbl_1", h)
        bd = bc(f"{b}.branch7x7dbl_2", bd, pad=(3, 0))
        bd = bc(f"{b}.branch7x7dbl_3", bd, pad=(0, 3))
        bd = bc(f"{b}.branch7x7dbl_4", bd, pad=(3, 0))
        bd = bc(f"{b}.branch7x7dbl_5", bd, pad=(0, 3))
        return torch.cat([b1, b7, bd, bc(f"{b}.branch_pool", avgp(h))], 1)

    def blk_d(b, h):
        b3 = bc(f"{b}.branch3x3_2", bc(f"{b}.branch3x3_1", h), stride=2)
        b7 = bc(f"{b}.branch7x7x3_1", h)
        b7 = bc(f"{b}.branch7x7x3_2", b7, pad=(0, 3))
        b7 = bc(f"{b}.branch7x7x3_3", b7, pad=(3, 0))
        b7 = bc(f"{b}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(h, 3, 2)], 1)

    def blk_e(b, h, pool):
        b1 = bc(f"{b}.branch1x1", h)
        b3 = bc(f"{b}.branch3x3_1", h)
        b3 = torch.cat([bc(f"{b}.branch3x3_2a", b3, pad=(0, 1)),
                        bc(f"{b}.branch3x3_2b", b3, pad=(1, 0))], 1)
        bd = bc(f"{b}.branch3x3dbl_1", h)
        bd = bc(f"{b}.branch3x3dbl_2", bd, pad=(1, 1))
        bd = torch.cat([bc(f"{b}.branch3x3dbl_3a", bd, pad=(0, 1)),
                        bc(f"{b}.branch3x3dbl_3b", bd, pad=(1, 0))], 1)
        pooled = (F.max_pool2d(h, 3, 1, 1) if pool == "max"
                  else avgp(h))
        return torch.cat([b1, b3, bd, bc(f"{b}.branch_pool", pooled)], 1)

    x = bc("Conv2d_1a_3x3", x, stride=2)
    x = bc("Conv2d_2a_3x3", x)
    x = bc("Conv2d_2b_3x3", x, pad=(1, 1))
    x = F.max_pool2d(x, 3, 2)
    x = bc("Conv2d_3b_1x1", x)
    x = bc("Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = blk_a(blk, x)
    x = blk_b("Mixed_6a", x)
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = blk_c(blk, x)
    x = blk_d("Mixed_7a", x)
    x = blk_e("Mixed_7b", x, pool="avg")
    x = blk_e("Mixed_7c", x, pool="max")
    return x.mean(dim=(2, 3))


def test_layer_name_table_is_complete():
    assert set(_all_shapes()) == set(jfid.conv_layer_names())


def test_inception_matches_torch_oracle(tmp_path):
    sd = _random_state_dict()
    pth = tmp_path / "fid_inception.pth"
    torch.save(sd, str(pth))

    rng = np.random.RandomState(0)
    x = (rng.rand(2, 3, 299, 299).astype(np.float32)) * 2 - 1  # pre-resized

    with torch.no_grad():
        want = _torch_pool3(sd, torch.from_numpy(x)).numpy()

    params = jfid.load_inception(str(pth))
    got = np.asarray(jfid.inception_forward(params, np.moveaxis(x, 1, -1)))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_preprocessing_matches_torch_interpolate(tmp_path):
    """inception_pool3_features = bilinear-resize-to-299 (align_corners=False)
    + 2x-1 + forward, exactly pytorch-fid's preprocessing."""
    sd = _random_state_dict(1)
    pth = tmp_path / "fid_inception.pth"
    torch.save(sd, str(pth))

    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 80, 96, 3).astype(np.float32)  # NHWC in [0,1]

    with torch.no_grad():
        t = torch.from_numpy(np.moveaxis(imgs, -1, 1))
        t = F.interpolate(t, size=(299, 299), mode="bilinear", align_corners=False)
        want = _torch_pool3(sd, t * 2 - 1).numpy()

    params = jfid.load_inception(str(pth))
    got = np.asarray(jfid.inception_pool3_features(params, imgs))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_frechet_distance_closed_forms():
    # identical stats -> 0
    mu = np.array([1.0, -2.0])
    s = np.array([[2.0, 0.3], [0.3, 1.0]])
    assert abs(jfid.frechet_distance(mu, s, mu, s)) < 1e-8
    # 1-D analytic: d^2 = (m1-m2)^2 + (sqrt(v1)-sqrt(v2))^2
    d = jfid.frechet_distance(np.array([0.0]), np.array([[4.0]]),
                              np.array([3.0]), np.array([[1.0]]))
    np.testing.assert_allclose(d, 9.0 + (2.0 - 1.0) ** 2, rtol=1e-8)


def test_feature_stats_streaming_matches_npcov():
    rng = np.random.RandomState(2)
    feats = rng.rand(37, 5)
    acc = jfid.FeatureStats(dim=5)
    for i in range(0, 37, 8):  # uneven chunks
        acc.update(feats[i : i + 8])
    mu, sigma = acc.stats()
    np.testing.assert_allclose(mu, feats.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(sigma, np.cov(feats, rowvar=False), rtol=1e-9)
    with pytest.raises(ValueError):
        jfid.FeatureStats(dim=5).stats()


def test_fid_metric_end_to_end(tmp_path):
    """FIDMetric streams (restored, GT) pairs: identical sets give ~0;
    distinct sets give a strictly larger value; reset() starts over."""
    sd = _random_state_dict(3)
    npz = {k: v.numpy() for k, v in sd.items()}
    path = tmp_path / "fid_inception.npz"
    np.savez(str(path), **npz)

    metric = jfid.fid_metric_from_env_or_arg(str(path))
    rng = np.random.RandomState(3)
    imgs = [(rng.rand(40, 40, 3) * 255).astype(np.uint8) for _ in range(3)]
    for im in imgs:
        metric.update(im, im)
    same = metric.result()

    metric.reset()
    for im in imgs:
        metric.update(255 - im, im)  # inverted outputs vs GT
    distinct = metric.result()

    # At tiny sample counts the 2048-dim covariance is rank-deficient and
    # sqrtm carries numerical noise (pytorch-fid behaves identically), so
    # pin the ORDERING, not absolute zero: identical sets score orders of
    # magnitude below genuinely different sets.
    assert distinct > 0 and distinct > 10 * abs(same), (same, distinct)

    assert jfid.fid_metric_from_env_or_arg(None) is None
