"""LPIPS(alex) perceptual distance, from scratch in JAX.

The reference evaluates LPIPS per image via the ``lpips`` pip package
(``codes/config/deraining/test.py:74,149-150``), which is absent from this
image and needs a network download for its AlexNet backbone.  This module
reimplements the exact LPIPS v0.1 alex math — AlexNet feature taps after
each ReLU, per-channel unit normalization, learned 1x1 linear weights on the
squared feature differences, spatial averaging, layer sum — as pure JAX, fed
by a user-supplied ``.pth``:

    # on any machine with the lpips package:
    import lpips, torch
    torch.save(lpips.LPIPS(net="alex").state_dict(), "lpips_alex.pth")

then pass ``--lpips-pth lpips_alex.pth`` to ``tools/test.py`` /
``tools/eval_parity.py`` (or set ``IRSDE_LPIPS_PTH``).  The state dict
carries both the torchvision AlexNet backbone (``net.slice*``) and the
learned linear heads (``lin*.model.1.weight``), so no download is needed
here.

The math is unit-tested against a hand-rolled torch forward of the same
randomized weights (tests/test_lpips.py).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature convs: (kernel, stride, pad, out_ch, state-dict key prefix,
# max-pool 3x3/s2 BEFORE this conv?).  Torchvision layout; the lpips wrapper
# splits features into slices named by the original module index
# (net.slice1.0 = features[0], net.slice2.3 = features[3], ...).
_ALEX_CONVS = (
    (11, 4, 2, 64, "net.slice1.0", False),
    (5, 1, 2, 192, "net.slice2.3", True),
    (3, 1, 1, 384, "net.slice3.6", True),
    (3, 1, 1, 256, "net.slice4.8", False),
    (3, 1, 1, 256, "net.slice5.10", False),
)


def params_from_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Convert an ``lpips.LPIPS(net='alex').state_dict()`` (numpy-valued ok)
    into this module's parameter pytree (HWIO convs, flat vectors)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    missing = [c[4] + ".weight" for c in _ALEX_CONVS if c[4] + ".weight" not in sd]
    if missing:
        raise ValueError(
            "LPIPS state dict is missing the AlexNet backbone keys "
            f"{missing[:2]}...; the official v0.1 alex.pth ships only the "
            "linear heads. Save the FULL module instead: "
            "torch.save(lpips.LPIPS(net='alex').state_dict(), ...)"
        )
    p: Dict[str, jnp.ndarray] = {
        # scaling layer buffers, (1,3,1,1) -> (3,)
        "shift": jnp.asarray(sd["scaling_layer.shift"].reshape(-1), jnp.float32),
        "scale": jnp.asarray(sd["scaling_layer.scale"].reshape(-1), jnp.float32),
    }
    for i, (_, _, _, _, key, _) in enumerate(_ALEX_CONVS):
        w = sd[key + ".weight"]  # OIHW -> HWIO
        p[f"conv{i}_w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)
        p[f"conv{i}_b"] = jnp.asarray(sd[key + ".bias"], jnp.float32)
        # lin heads: 1x1 conv (1, C, 1, 1), no bias -> (C,)
        lw = sd[f"lin{i}.model.1.weight"]
        p[f"lin{i}"] = jnp.asarray(lw.reshape(-1), jnp.float32)
    return p


def load_lpips_params(pth_path: str) -> Dict[str, jnp.ndarray]:
    """Load LPIPS weights from a torch ``.pth`` (full state dict) or an
    ``.npz`` with the same key names."""
    if pth_path.endswith(".npz"):
        with np.load(pth_path) as z:
            return params_from_state_dict(dict(z))
    import torch  # lazy; only needed for .pth deserialization

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    return params_from_state_dict({k: v.numpy() for k, v in sd.items()})


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool_3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _unit_normalize(x, eps=1e-10):
    # lpips.normalize_tensor: x / (||x||_2-over-channels + eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_alex(params: Dict[str, jnp.ndarray], img0: jnp.ndarray,
               img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS v0.1 alex distance for NHWC inputs in [-1, 1].  Returns (B,).

    Matches lpips.LPIPS.forward with spatial=False, normalize=False.
    """

    def feats(x):
        h = (x - params["shift"]) / params["scale"]
        taps = []
        for i, (_, stride, pad, _, _, pool_before) in enumerate(_ALEX_CONVS):
            if pool_before:
                h = _maxpool_3s2(h)
            h = jax.nn.relu(_conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"],
                                  stride, pad))
            taps.append(_unit_normalize(h))
        return taps

    total = 0.0
    for i, (f0, f1) in enumerate(zip(feats(img0), feats(img1))):
        diff2 = (f0 - f1) ** 2
        lin = jnp.sum(diff2 * params[f"lin{i}"], axis=-1)  # 1x1 conv, no bias
        total = total + jnp.mean(lin, axis=(1, 2))  # spatial average
    return total


def make_lpips_fn(pth_path: str):
    """uint8-RGB convenience closure matching the drivers' metric hook:
    ``fn(a_rgb_uint8 HWC, b_rgb_uint8 HWC) -> float``.

    Inputs are mapped to [-1, 1] exactly as the reference does
    (``test.py:149-150``: tensors in [0,1] scaled by ``*2-1``).
    """
    params = load_lpips_params(pth_path)
    dist = jax.jit(functools.partial(lpips_alex, params))

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
