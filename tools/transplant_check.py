#!/usr/bin/env python
"""Transplant-parity harness: reference torch net vs this framework's Flax net.

Builds the reference PyTorch module (imported from /root/reference sources),
loads a ``.pth`` into it (or uses its random init), imports the same weights
into the Flax net via utils/torch_import, runs both on the same input, and
reports max|delta| over the outputs.  This makes the PARITY.md transplant
numbers reproducible whenever reference weights are present.

Usage:
  python tools/transplant_check.py --arch ConditionalUNet [--pth model.pth]
      [--setting '{"nf": 64, "depth": 4}'] [--size 64] [--batch 1]

Multiple archs per process are fine — the previously imported reference
``modules`` package is purged before each build.

Ref sources: deraining/models/modules/DenoisingUNet_arch.py:19-134,
DenoisingNAFNet_arch.py:87-188, stereo-sr/.../DenoisingNAFNet_arch.py,
latent-bokeh/.../DenoisingNAFNet_arch.py, latent-dehazing/.../DiT_arch.py,
unet-latent/.../UNet_arch.py.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REFERENCE = os.environ.get("IRSDE_REFERENCE", "/root/reference")

# arch -> (reference task dir, torch class name in its modules package)
TASK_DIR = {
    "ConditionalUNet": ("deraining", "ConditionalUNet"),
    # unconditional denoising-sde variant: forward(x, t), full mid attention
    "DenoisingUNet": ("denoising-sde", "ConditionalUNet"),
    "ConditionalNAFNet": ("deraining", "ConditionalNAFNet"),
    "StereoConditionalNAFNet": ("stereo-sr", "ConditionalNAFNet"),
    "BokehConditionalNAFNet": ("latent-bokeh", "ConditionalNAFNet"),
    "DiT": ("latent-dehazing", "DiT"),
    "UNet": ("unet-latent", "UNet"),
}

DEFAULT_SETTINGS = {
    "ConditionalUNet": {"in_nc": 3, "out_nc": 3, "nf": 16, "depth": 3},
    "DenoisingUNet": {"in_nc": 3, "out_nc": 3, "nf": 16, "depth": 3},
    "ConditionalNAFNet": {"width": 16, "enc_blk_nums": [1, 1], "middle_blk_num": 1,
                          "dec_blk_nums": [1, 1]},
    "StereoConditionalNAFNet": {"width": 8, "enc_blk_nums": [1], "middle_blk_num": 1,
                                "dec_blk_nums": [1]},
    "BokehConditionalNAFNet": {"img_channel": 4, "width": 8, "enc_blk_nums": [1, 1],
                               "middle_blk_num": 1, "dec_blk_nums": [1, 1]},
    "DiT": {"patch_size": 2, "in_channels": 4, "hidden_size": 64, "depth": 2,
            "num_heads": 4},
    "UNet": {"in_ch": 3, "out_ch": 3, "ch": 8, "ch_mult": [1, 2, 4], "embed_dim": 4},
}


def _stub_timm():
    """Minimal timm.models.vision_transformer Attention/Mlp (the only two
    symbols the reference DiT imports, DiT_arch.py:17) for images without
    the timm package.  Matches timm's math: fused qkv with bias, per-head
    softmax attention, two-layer MLP."""
    if "timm" in sys.modules:
        return
    import types

    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features, act_layer, drop=0.0):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    layers = types.ModuleType("timm.models.layers")
    vit.Attention, vit.Mlp = Attention, Mlp
    layers.to_2tuple = to_2tuple
    models.vision_transformer = vit
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vit
    sys.modules["timm.models.layers"] = layers


def build_torch_net(arch: str, setting: dict):
    task_dir, cls_name = TASK_DIR[arch]
    if arch == "DiT":
        _stub_timm()
    models_dir = os.path.join(REFERENCE, "codes", "config", task_dir, "models")
    if not os.path.isdir(models_dir):
        raise FileNotFoundError(f"reference sources not found at {models_dir}")
    # every task dir exposes a package named ``modules`` — purge any
    # previously imported one so multiple archs work in one process
    for mod in [m for m in sys.modules if m == "modules" or m.startswith("modules.")]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if not p.endswith(os.path.join("models"))]
    sys.path.insert(0, models_dir)
    if arch == "DiT":
        # the task package only exports the size-ladder ctors; the class
        # itself lives in the arch submodule
        modules = importlib.import_module("modules.DiT_arch")
    else:
        modules = importlib.import_module("modules")
    cls = getattr(modules, cls_name)
    net = cls(**setting)
    net.eval()
    return net


def build_flax_net(arch: str, setting: dict):
    from image_restoration_sde_tpu.models import build_network

    if arch == "DenoisingUNet":
        return build_network("ConditionalUNet", {**setting, "conditional": False})
    return build_network(arch, setting)


def flax_rules(arch: str, setting: dict):
    from image_restoration_sde_tpu.utils.torch_import import rules_for_network

    if arch == "DenoisingUNet":
        return rules_for_network("ConditionalUNet", {**setting, "conditional": False})
    return rules_for_network(arch, setting)


def compare(arch: str, setting: dict, pth: str | None, size: int, batch: int,
            seed: int = 0) -> float:
    import torch

    import jax
    import jax.numpy as jnp

    from image_restoration_sde_tpu.utils.torch_import import apply_rules

    tnet = build_torch_net(arch, setting)
    if pth:
        sd = torch.load(pth, map_location="cpu", weights_only=True)
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        tnet.load_state_dict(sd, strict=True)
    else:
        # random-init comparison: re-randomize EVERY torch param so the
        # zero-init branches (NAF beta/gamma, adaLN-Zero) don't mask
        # transplant mismatches behind exact zeros
        torch.manual_seed(seed)
        with torch.no_grad():
            for p in tnet.parameters():
                p.normal_(0.0, 0.05)
    state_dict = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    rng = np.random.RandomState(seed)
    in_ch = int(setting.get("in_nc") or setting.get("img_channel")
                or setting.get("in_channels") or setting.get("in_ch") or 3)
    if arch == "StereoConditionalNAFNet":
        in_ch *= 2
    x = rng.rand(batch, size, size, in_ch).astype(np.float32)
    cond = rng.rand(batch, size, size, in_ch).astype(np.float32)
    tvec = rng.uniform(1, 50, batch).astype(np.float32)
    lens = tuple(rng.uniform(-8, 8, batch).astype(np.float32) for _ in range(3))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ct = torch.from_numpy(cond.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(tvec)

    with torch.no_grad():
        if arch == "UNet":
            t_out = tnet(xt)
        elif arch == "DenoisingUNet":
            t_out = tnet(xt, tt)
        elif arch == "BokehConditionalNAFNet":
            t_out = tnet(xt, ct, tt, lens_info=[torch.from_numpy(v) for v in lens])
        else:
            t_out = tnet(xt, ct, tt)
    t_out = t_out.numpy().transpose(0, 2, 3, 1)

    fnet = build_flax_net(arch, setting)
    xj, cj, tj = jnp.asarray(x), jnp.asarray(cond), jnp.asarray(tvec)
    if arch == "UNet":
        params = jax.jit(fnet.init)(jax.random.PRNGKey(0), xj)
    elif arch == "DenoisingUNet":
        params = jax.jit(lambda k: fnet.init(k, xj, None, tj))(jax.random.PRNGKey(0))
    elif arch == "BokehConditionalNAFNet":
        params = jax.jit(
            lambda k: fnet.init(k, xj, cj, tj, lens_info=tuple(map(jnp.asarray, lens)))
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(fnet.init)(jax.random.PRNGKey(0), xj, cj, tj)
    params = apply_rules(params, state_dict, flax_rules(arch, setting))

    if arch == "UNet":
        f_out = jax.jit(fnet.apply)(params, xj)
    elif arch == "DenoisingUNet":
        f_out = jax.jit(lambda p: fnet.apply(p, xj, None, tj))(params)
    elif arch == "BokehConditionalNAFNet":
        f_out = jax.jit(
            lambda p: fnet.apply(p, xj, cj, tj, lens_info=tuple(map(jnp.asarray, lens)))
        )(params)
    else:
        f_out = jax.jit(fnet.apply)(params, xj, cj, tj)
    f_out = np.asarray(f_out)

    delta = float(np.abs(f_out - t_out).max())
    scale = float(np.abs(t_out).max()) or 1.0
    print(f"{arch}: max|delta| = {delta:.3e} (torch out max|.| {scale:.3e}, "
          f"rel {delta / scale:.3e})")
    return delta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", required=True, choices=sorted(TASK_DIR))
    p.add_argument("--pth", default=None, help="reference checkpoint; random init if omitted")
    p.add_argument("--setting", default=None, help="JSON network setting")
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()
    setting = json.loads(args.setting) if args.setting else DEFAULT_SETTINGS[args.arch]
    compare(args.arch, setting, args.pth, args.size, args.batch)


if __name__ == "__main__":
    main()
