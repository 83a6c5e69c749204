"""LPIPS perceptual distance (alex + vgg backbones), from scratch in JAX.

The reference evaluates LPIPS per image via the ``lpips`` pip package
(``codes/config/deraining/test.py:74,149-150``, net='alex') and its
``PerceptualMatchingLoss`` training loss wraps ``lpips.LPIPS(net='vgg')``
(``codes/config/unet-latent/models/modules/loss.py:34-58``).  The package is
absent from this image and needs a network download for its backbones.  This
module reimplements the exact LPIPS v0.1 math — backbone feature taps after
each slice's last ReLU, per-channel unit normalization, learned 1x1 linear
weights on the squared feature differences, spatial averaging, layer sum —
as pure JAX, fed by a user-supplied ``.pth``:

    # on any machine with the lpips package:
    import lpips, torch
    torch.save(lpips.LPIPS(net="alex").state_dict(), "lpips_alex.pth")
    torch.save(lpips.LPIPS(net="vgg").state_dict(), "lpips_vgg.pth")

then pass ``--lpips-pth lpips_alex.pth`` to ``tools/test.py`` /
``tools/eval_parity.py`` (or set ``IRSDE_LPIPS_PTH``).  The state dict
carries both the torchvision backbone (``net.slice*``) and the learned
linear heads (``lin*.model.1.weight``), so no download is needed here; the
backbone is auto-detected from the keys.  ``make_perceptual_loss_fn`` wraps
the same math as a *differentiable in-graph* term for
``training.losses.perceptual_matching_loss``.

The math is unit-tested against hand-rolled torch forwards of the same
randomized weights for both backbones (tests/test_lpips.py).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Backbone conv specs: (kernel, stride, pad, out_ch, state-dict key prefix,
# max-pool BEFORE this conv?).  Torchvision layout; the lpips wrapper splits
# features into slices named by the original module index
# (net.slice1.0 = features[0], net.slice2.3 = features[3], ...).
_ALEX_CONVS = (
    (11, 4, 2, 64, "net.slice1.0", False),
    (5, 1, 2, 192, "net.slice2.3", True),
    (3, 1, 1, 384, "net.slice3.6", True),
    (3, 1, 1, 256, "net.slice4.8", False),
    (3, 1, 1, 256, "net.slice5.10", False),
)

# VGG16 features; lpips taps relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3
# (pretrained_networks.vgg16 slices: [0..3], [4..8], [9..15], [16..22],
# [23..29] — a 2x2/s2 max-pool opens slices 2-5).
_VGG_CONVS = (
    (3, 1, 1, 64, "net.slice1.0", False),
    (3, 1, 1, 64, "net.slice1.2", False),
    (3, 1, 1, 128, "net.slice2.5", True),
    (3, 1, 1, 128, "net.slice2.7", False),
    (3, 1, 1, 256, "net.slice3.10", True),
    (3, 1, 1, 256, "net.slice3.12", False),
    (3, 1, 1, 256, "net.slice3.14", False),
    (3, 1, 1, 512, "net.slice4.17", True),
    (3, 1, 1, 512, "net.slice4.19", False),
    (3, 1, 1, 512, "net.slice4.21", False),
    (3, 1, 1, 512, "net.slice5.24", True),
    (3, 1, 1, 512, "net.slice5.26", False),
    (3, 1, 1, 512, "net.slice5.28", False),
)

# taps = conv indices whose (normalized) ReLU output feeds lin head k;
# pool = (kernel, stride) of the backbone's max-pool.
_SPECS = {
    "alex": {"convs": _ALEX_CONVS, "taps": (0, 1, 2, 3, 4), "pool": (3, 2)},
    "vgg": {"convs": _VGG_CONVS, "taps": (1, 3, 6, 9, 12), "pool": (2, 2)},
}


def detect_net(keys) -> str:
    """'vgg' iff the state dict has VGG's second slice-1 conv."""
    return "vgg" if "net.slice1.2.weight" in keys else "alex"


def params_from_state_dict(
    state_dict: Dict[str, np.ndarray], net: str | None = None
) -> Dict[str, jnp.ndarray]:
    """Convert an ``lpips.LPIPS(net=...).state_dict()`` (numpy-valued ok)
    into this module's parameter pytree (HWIO convs, flat vectors).  The
    backbone is auto-detected from the keys unless ``net`` is given."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    net = net or detect_net(sd)
    spec = _SPECS[net]
    missing = [c[4] + ".weight" for c in spec["convs"] if c[4] + ".weight" not in sd]
    if missing:
        raise ValueError(
            f"LPIPS state dict is missing the {net} backbone keys "
            f"{missing[:2]}...; the official v0.1 .pth ships only the "
            "linear heads. Save the FULL module instead: "
            f"torch.save(lpips.LPIPS(net='{net}').state_dict(), ...)"
        )
    p: Dict[str, jnp.ndarray] = {
        # scaling layer buffers, (1,3,1,1) -> (3,)
        "shift": jnp.asarray(sd["scaling_layer.shift"].reshape(-1), jnp.float32),
        "scale": jnp.asarray(sd["scaling_layer.scale"].reshape(-1), jnp.float32),
    }
    for i, (_, _, _, _, key, _) in enumerate(spec["convs"]):
        w = sd[key + ".weight"]  # OIHW -> HWIO
        p[f"conv{i}_w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)
        p[f"conv{i}_b"] = jnp.asarray(sd[key + ".bias"], jnp.float32)
    for k in range(len(spec["taps"])):
        # lin heads: 1x1 conv (1, C, 1, 1), no bias -> (C,)
        p[f"lin{k}"] = jnp.asarray(sd[f"lin{k}.model.1.weight"].reshape(-1), jnp.float32)
    return p


def load_lpips(pth_path: str):
    """Load LPIPS weights from a torch ``.pth`` (full state dict) or an
    ``.npz`` with the same key names.  Returns ``(params, net)``."""
    if pth_path.endswith(".npz"):
        with np.load(pth_path) as z:
            sd = dict(z)
    else:
        import torch  # lazy; only needed for .pth deserialization

        raw = torch.load(pth_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
    net = detect_net(sd)
    return params_from_state_dict(sd, net), net


def load_lpips_params(pth_path: str) -> Dict[str, jnp.ndarray]:
    """Back-compat wrapper: params only (backbone auto-detected)."""
    return load_lpips(pth_path)[0]


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _unit_normalize(x, eps=1e-10):
    # lpips.normalize_tensor: x / (||x||_2-over-channels + eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: Dict[str, jnp.ndarray], img0: jnp.ndarray,
                   img1: jnp.ndarray, net: str = "alex") -> jnp.ndarray:
    """LPIPS v0.1 distance for NHWC inputs in [-1, 1].  Returns (B,).

    Matches lpips.LPIPS.forward with spatial=False, normalize=False.
    """
    spec = _SPECS[net]
    pk, ps = spec["pool"]

    def feats(x):
        h = (x - params["shift"]) / params["scale"]
        taps = []
        for i, (_, stride, pad, _, _, pool_before) in enumerate(spec["convs"]):
            if pool_before:
                h = _maxpool(h, pk, ps)
            h = jax.nn.relu(_conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"],
                                  stride, pad))
            if i in spec["taps"]:
                taps.append(_unit_normalize(h))
        return taps

    total = 0.0
    for k, (f0, f1) in enumerate(zip(feats(img0), feats(img1))):
        diff2 = (f0 - f1) ** 2
        lin = jnp.sum(diff2 * params[f"lin{k}"], axis=-1)  # 1x1 conv, no bias
        total = total + jnp.mean(lin, axis=(1, 2))  # spatial average
    return total


def lpips_alex(params: Dict[str, jnp.ndarray], img0: jnp.ndarray,
               img1: jnp.ndarray) -> jnp.ndarray:
    """Back-compat alias for the alex backbone."""
    return lpips_distance(params, img0, img1, net="alex")


def make_perceptual_loss_fn(pth_path: str):
    """Differentiable in-graph LPIPS term for
    ``training.losses.perceptual_matching_loss``: ``fn(predict, target) ->
    scalar`` (batch-mean distance), traceable under jit/grad — the backbone
    weights are closed-over constants, so gradients flow to ``predict``.

    Inputs are NHWC 3-channel in [0, 1]: the reference calls its vgg lpips
    with ``normalize=True`` (loss.py:52), which maps [0,1] -> [-1,1] first.
    """
    params, net = load_lpips(pth_path)

    def fn(predict, target):
        d = lpips_distance(params, predict * 2.0 - 1.0, target * 2.0 - 1.0, net=net)
        return d.mean()

    return fn


def make_lpips_fn(pth_path: str):
    """uint8-RGB convenience closure matching the drivers' metric hook:
    ``fn(a_rgb_uint8 HWC, b_rgb_uint8 HWC) -> float``.

    Inputs are mapped to [-1, 1] exactly as the reference does
    (``test.py:149-150``: tensors in [0,1] scaled by ``*2-1``).
    """
    params, net = load_lpips(pth_path)
    dist = jax.jit(functools.partial(lpips_distance, params, net=net))

    def compute(a_rgb_uint8: np.ndarray, b_rgb_uint8: np.ndarray) -> float:
        a = jnp.asarray(a_rgb_uint8, jnp.float32)[None] / 127.5 - 1.0
        b = jnp.asarray(b_rgb_uint8, jnp.float32)[None] / 127.5 - 1.0
        return float(dist(a, b)[0])

    return compute


def lpips_fn_from_env_or_arg(pth_path: str | None):
    """Resolve the driver hook: explicit ``--lpips-pth`` beats the
    ``IRSDE_LPIPS_PTH`` env var; returns None when neither is set."""
    path = pth_path or os.environ.get("IRSDE_LPIPS_PTH")
    if not path:
        return None
    return make_lpips_fn(path)
