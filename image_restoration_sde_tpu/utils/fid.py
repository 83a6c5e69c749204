"""FID (Fréchet Inception Distance), from scratch in JAX.

The reference publishes FID in its Rain100H metric table
(``/root/reference/README.md:46``) but ships no code computing it (the
number comes from the external ``pytorch-fid`` tool).  This module completes
the published metric surface the same way ``utils/lpips.py`` does: a
from-scratch JAX InceptionV3 (pool3 features, 2048-d) fed by a
user-supplied ``.pth`` — no pip package, no download:

    # on any machine with pytorch-fid (or torchvision):
    from pytorch_fid.inception import fid_inception_v3
    import torch
    torch.save(fid_inception_v3().state_dict(), "fid_inception.pth")
    # (torchvision.models.inception_v3 weights use the same key names)

then pass ``--fid-pth fid_inception.pth`` to ``tools/test.py`` /
``tools/eval_parity.py`` (or set ``IRSDE_FID_PTH``).

Implemented architecture = the ``pytorch-fid`` InceptionV3 variant (the
TF-ported model everyone's published FID numbers use), which differs from
stock torchvision in two ways this module replicates:

- every in-block 3x3/s1/p1 average pool uses ``count_include_pad=False``;
- the LAST E-block (Mixed_7c) pools its branch_pool input with a MAX pool
  instead of avg (a quirk of the original TF export, kept for parity).

BatchNorm (eps=1e-3, inference mode) is folded into the conv weights at
load time — each layer becomes one fused conv+bias+relu, which is both the
exact math and the TPU-friendly form.  Inputs are NHWC float in [0, 1];
features are taken after bilinear resize to 299x299 (align_corners=False,
matching ``pytorch_fid`` preprocessing) and (2x-1) scaling.

The math is unit-tested against a hand-rolled torch forward of the same
randomized weights (tests/test_fid.py).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3

_A_BLOCKS = ("Mixed_5b", "Mixed_5c", "Mixed_5d")
_C_BLOCKS = ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e")
_E_BLOCKS = ("Mixed_7b", "Mixed_7c")

_STEM = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3")
_A_CONVS = ("branch1x1", "branch5x5_1", "branch5x5_2",
            "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
_B_CONVS = ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3")
_C_CONVS = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
            "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
            "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
_D_CONVS = ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
            "branch7x7x3_3", "branch7x7x3_4")
_E_CONVS = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
            "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
            "branch3x3dbl_3b", "branch_pool")


def conv_layer_names():
    """All BasicConv2d layer names of the pool3 feature extractor, in
    torchvision/pytorch-fid state-dict naming."""
    names = list(_STEM)
    for blk in _A_BLOCKS:
        names += [f"{blk}.{c}" for c in _A_CONVS]
    names += [f"Mixed_6a.{c}" for c in _B_CONVS]
    for blk in _C_BLOCKS:
        names += [f"{blk}.{c}" for c in _C_CONVS]
    names += [f"Mixed_7a.{c}" for c in _D_CONVS]
    for blk in _E_BLOCKS:
        names += [f"{blk}.{c}" for c in _E_CONVS]
    return names


def params_from_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, Tuple]:
    """Fold each BasicConv2d's BatchNorm into its conv: returns
    ``{layer_name: (w_hwio, b)}``.  Accepts pytorch-fid FID weights or a
    torchvision ``inception_v3`` state dict (fc / AuxLogits keys ignored)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict[str, Tuple] = {}
    for name in conv_layer_names():
        try:
            w = sd[f"{name}.conv.weight"]  # OIHW, bias-free
            gamma = sd[f"{name}.bn.weight"]
            beta = sd[f"{name}.bn.bias"]
            mean = sd[f"{name}.bn.running_mean"]
            var = sd[f"{name}.bn.running_var"]
        except KeyError as e:
            raise ValueError(
                f"InceptionV3 state dict is missing {e.args[0]!r} — save the "
                "full module state_dict (pytorch_fid.inception.fid_inception_v3"
                "().state_dict() or torchvision inception_v3)."
            ) from None
        scale = (gamma / np.sqrt(var + _BN_EPS)).astype(np.float64)
        w_hwio = np.transpose(w.astype(np.float64), (2, 3, 1, 0)) * scale
        b = beta.astype(np.float64) - mean.astype(np.float64) * scale
        p[name] = (jnp.asarray(w_hwio, jnp.float32), jnp.asarray(b, jnp.float32))
    return p


def load_inception(pth_path: str) -> Dict[str, Tuple]:
    """Load InceptionV3 weights from a torch ``.pth`` state dict or an
    ``.npz`` with the same key names."""
    if pth_path.endswith(".npz"):
        with np.load(pth_path) as z:
            sd = dict(z)
    else:
        import torch  # lazy; only needed for .pth deserialization

        raw = torch.load(pth_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
    return params_from_state_dict(sd)


# ----------------------------------------------------------------- forward
def _conv(p, name, x, stride=1, pad=(0, 0)):
    w, b = p[name]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + b)


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avgpool3s1p1(x, count_include_pad=False):
    """3x3/s1/p1 average pool.  pytorch-fid's blocks use
    ``count_include_pad=False``: border windows divide by the number of
    VALID taps, not 9."""
    win, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strides, pad)
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, strides, pad)
    return s / cnt


def _inception_a(p, blk, x):
    b1 = _conv(p, f"{blk}.branch1x1", x)
    b5 = _conv(p, f"{blk}.branch5x5_1", x)
    b5 = _conv(p, f"{blk}.branch5x5_2", b5, pad=(2, 2))
    b3 = _conv(p, f"{blk}.branch3x3dbl_1", x)
    b3 = _conv(p, f"{blk}.branch3x3dbl_2", b3, pad=(1, 1))
    b3 = _conv(p, f"{blk}.branch3x3dbl_3", b3, pad=(1, 1))
    bp = _conv(p, f"{blk}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, blk, x):
    b3 = _conv(p, f"{blk}.branch3x3", x, stride=2)
    bd = _conv(p, f"{blk}.branch3x3dbl_1", x)
    bd = _conv(p, f"{blk}.branch3x3dbl_2", bd, pad=(1, 1))
    bd = _conv(p, f"{blk}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(p, blk, x):
    b1 = _conv(p, f"{blk}.branch1x1", x)
    b7 = _conv(p, f"{blk}.branch7x7_1", x)
    b7 = _conv(p, f"{blk}.branch7x7_2", b7, pad=(0, 3))
    b7 = _conv(p, f"{blk}.branch7x7_3", b7, pad=(3, 0))
    bd = _conv(p, f"{blk}.branch7x7dbl_1", x)
    bd = _conv(p, f"{blk}.branch7x7dbl_2", bd, pad=(3, 0))
    bd = _conv(p, f"{blk}.branch7x7dbl_3", bd, pad=(0, 3))
    bd = _conv(p, f"{blk}.branch7x7dbl_4", bd, pad=(3, 0))
    bd = _conv(p, f"{blk}.branch7x7dbl_5", bd, pad=(0, 3))
    bp = _conv(p, f"{blk}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, blk, x):
    b3 = _conv(p, f"{blk}.branch3x3_1", x)
    b3 = _conv(p, f"{blk}.branch3x3_2", b3, stride=2)
    b7 = _conv(p, f"{blk}.branch7x7x3_1", x)
    b7 = _conv(p, f"{blk}.branch7x7x3_2", b7, pad=(0, 3))
    b7 = _conv(p, f"{blk}.branch7x7x3_3", b7, pad=(3, 0))
    b7 = _conv(p, f"{blk}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(p, blk, x, pool="avg"):
    b1 = _conv(p, f"{blk}.branch1x1", x)
    b3 = _conv(p, f"{blk}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv(p, f"{blk}.branch3x3_2a", b3, pad=(0, 1)),
        _conv(p, f"{blk}.branch3x3_2b", b3, pad=(1, 0)),
    ], axis=-1)
    bd = _conv(p, f"{blk}.branch3x3dbl_1", x)
    bd = _conv(p, f"{blk}.branch3x3dbl_2", bd, pad=(1, 1))
    bd = jnp.concatenate([
        _conv(p, f"{blk}.branch3x3dbl_3a", bd, pad=(0, 1)),
        _conv(p, f"{blk}.branch3x3dbl_3b", bd, pad=(1, 0)),
    ], axis=-1)
    if pool == "max":
        # FIDInceptionE_2 (Mixed_7c): max pool where torchvision avg-pools —
        # a quirk of the original TF export, kept for published-number parity
        pooled = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    else:
        pooled = _avgpool3s1p1(x)
    bp = _conv(p, f"{blk}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_forward(params, x299):
    """Pool3 features for a (B, 299, 299, 3) batch already in [-1, 1]."""
    x = _conv(params, "Conv2d_1a_3x3", x299, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, pad=(1, 1))
    x = _maxpool3s2(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _maxpool3s2(x)
    for blk in _A_BLOCKS:
        x = _inception_a(params, blk, x)
    x = _inception_b(params, "Mixed_6a", x)
    for blk in _C_BLOCKS:
        x = _inception_c(params, blk, x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def inception_pool3_features(params, imgs):
    """(B, H, W, 3) float in [0, 1] -> (B, 2048) pool3 features, with
    pytorch-fid preprocessing: bilinear resize to 299 (half-pixel centers =
    torch ``align_corners=False``), then 2x-1 scaling."""
    B, _, _, C = imgs.shape
    x = jax.image.resize(imgs, (B, 299, 299, C), "bilinear")
    return inception_forward(params, x * 2.0 - 1.0)


# -------------------------------------------------------------- the metric
def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d² = |mu1-mu2|² + tr(S1 + S2 - 2·sqrtm(S1·S2)) — pytorch-fid
    numerics, including the eps-jitter retry when sqrtm goes singular."""
    from scipy import linalg

    def _sqrtm(a):
        out = linalg.sqrtm(a)  # newer scipy returns the matrix, older a tuple
        return out[0] if isinstance(out, tuple) else out

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class FeatureStats:
    """Streaming mean/covariance accumulator (one pass, no feature cache)."""

    def __init__(self, dim: int = 2048):
        self.n = 0
        self._sum = np.zeros(dim, np.float64)
        self._outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self._sum += feats.sum(axis=0)
        self._outer += feats.T @ feats

    def stats(self):
        if self.n < 2:
            raise ValueError("FID needs at least 2 images per set")
        mu = self._sum / self.n
        # unbiased covariance, matching np.cov(feats, rowvar=False)
        sigma = (self._outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, sigma


class FIDMetric:
    """Driver hook: feed (restored, GT) uint8 RGB HWC pairs per image, read
    the set-level FID at the end.  Mirrors how published FID tables are
    produced (pytorch-fid over the result dir vs the GT dir)."""

    def __init__(self, pth_path: str):
        params = load_inception(pth_path)
        self._feat = jax.jit(functools.partial(inception_pool3_features, params))
        self.reset()

    def reset(self) -> None:
        self.out_stats = FeatureStats()
        self.ref_stats = FeatureStats()

    def update(self, out_rgb_uint8: np.ndarray, gt_rgb_uint8: np.ndarray) -> None:
        for acc, img in ((self.out_stats, out_rgb_uint8),
                         (self.ref_stats, gt_rgb_uint8)):
            x = jnp.asarray(img, jnp.float32)[None] / 255.0
            acc.update(np.asarray(self._feat(x)))

    def result(self) -> float:
        mu1, s1 = self.out_stats.stats()
        mu2, s2 = self.ref_stats.stats()
        return frechet_distance(mu1, s1, mu2, s2)


def fid_metric_from_env_or_arg(pth_path: str | None):
    """Resolve the driver hook: explicit ``--fid-pth`` beats the
    ``IRSDE_FID_PTH`` env var; returns None when neither is set."""
    path = pth_path or os.environ.get("IRSDE_FID_PTH")
    if not path:
        return None
    return FIDMetric(path)
