"""Import reference PyTorch checkpoints (.pth) into Flax parameter trees.

Lets users of the reference repo (Algolzw/image-restoration-sde) bring their
trained weights: maps the reference ``state_dict`` key space onto this
framework's module tree with the required layout transposes
(OIHW -> HWIO convs, (out,in) -> (in,out) dense, (1,C,1,1) -> (C,) norms).

Torch is only needed when actually loading a ``.pth`` (lazy import); the
key-mapping itself is pure and is unit-tested against numpy dicts.

Supported: ConditionalUNet (DenoisingUNet_arch.py), ConditionalNAFNet
(DenoisingNAFNet_arch.py), latent compressor UNet (UNet_arch.py), stereo
ConditionalNAFNet with SCAM (stereo-sr/.../DenoisingNAFNet_arch.py), bokeh
ConditionalNAFNet with cam_mlp (latent-bokeh/.../DenoisingNAFNet_arch.py),
and DiT (latent-dehazing/.../DiT_arch.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np


def _conv_w(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w):  # (out, in) -> (in, out)
    return np.transpose(w, (1, 0))


def _norm_g(w):  # (1, C, 1, 1) -> (C,)
    return np.reshape(w, (-1,))


def _ident(w):
    return np.asarray(w)


Rule = Tuple[str, Callable]


def _resblock_rules(torch_prefix: str, flax_prefix: str, has_res_conv: bool) -> Dict[str, Rule]:
    rules = {
        f"{flax_prefix}/Dense_0/kernel": (f"{torch_prefix}.mlp.1.weight", _dense_w),
        f"{flax_prefix}/Dense_0/bias": (f"{torch_prefix}.mlp.1.bias", _ident),
        f"{flax_prefix}/Block_0/Conv_0/kernel": (f"{torch_prefix}.block1.proj.weight", _conv_w),
        f"{flax_prefix}/Block_1/Conv_0/kernel": (f"{torch_prefix}.block2.proj.weight", _conv_w),
    }
    if has_res_conv:
        rules[f"{flax_prefix}/Conv_0/kernel"] = (f"{torch_prefix}.res_conv.weight", _conv_w)
    return rules


def _linear_attn_rules(torch_prefix: str, flax_attn: str, flax_wrap: str) -> Dict[str, Rule]:
    # torch: Residual(PreNorm(dim, LinearAttention(dim))) => .fn.norm / .fn.fn
    return {
        f"{flax_wrap}/ChannelLayerNorm_0/g": (f"{torch_prefix}.fn.norm.g", _norm_g),
        f"{flax_attn}/Conv_0/kernel": (f"{torch_prefix}.fn.fn.to_qkv.weight", _conv_w),
        f"{flax_attn}/Conv_1/kernel": (f"{torch_prefix}.fn.fn.to_out.0.weight", _conv_w),
        f"{flax_attn}/Conv_1/bias": (f"{torch_prefix}.fn.fn.to_out.0.bias", _ident),
        f"{flax_attn}/ChannelLayerNorm_0/g": (f"{torch_prefix}.fn.fn.to_out.1.g", _norm_g),
    }


def _full_attn_rules(torch_prefix: str, flax_attn: str, flax_wrap: str) -> Dict[str, Rule]:
    # torch: Residual(PreNorm(dim, Attention(dim))) — full spatial attention;
    # to_out is a bare Conv2d (no LayerNorm), ref module_util.py:182-204
    return {
        f"{flax_wrap}/ChannelLayerNorm_0/g": (f"{torch_prefix}.fn.norm.g", _norm_g),
        f"{flax_attn}/Conv_0/kernel": (f"{torch_prefix}.fn.fn.to_qkv.weight", _conv_w),
        f"{flax_attn}/Conv_1/kernel": (f"{torch_prefix}.fn.fn.to_out.weight", _conv_w),
        f"{flax_attn}/Conv_1/bias": (f"{torch_prefix}.fn.fn.to_out.bias", _ident),
    }


def unet_key_rules(depth: int = 4, conditional: bool = True) -> Dict[str, Rule]:
    """flax path -> (torch state_dict key, transform) for ConditionalUNet.

    Reference layout: DenoisingUNet_arch.py:49-76 — ``downs.{i}.{0,1,2,3}``,
    ``ups.{j}`` built with insert(0) so torch index j covers level
    ``depth-1-j``.  The unconditional denoising-sde variant uses FULL
    attention in the mid block (denoising-sde/.../DenoisingUNet_arch.py:71).
    """
    rules: Dict[str, Rule] = {
        "init_conv/kernel": ("init_conv.weight", _conv_w),
        "time_mlp_1/kernel": ("time_mlp.1.weight", _dense_w),
        "time_mlp_1/bias": ("time_mlp.1.bias", _ident),
        "time_mlp_2/kernel": ("time_mlp.3.weight", _dense_w),
        "time_mlp_2/bias": ("time_mlp.3.bias", _ident),
        "final_conv/kernel": ("final_conv.weight", _conv_w),
        "final_conv/bias": ("final_conv.bias", _ident),
    }
    rules.update(_resblock_rules("final_res_block", "final_res_block", True))
    rules.update(_resblock_rules("mid_block1", "mid_block1", False))
    rules.update(_resblock_rules("mid_block2", "mid_block2", False))
    if conditional:
        rules.update(_linear_attn_rules("mid_attn", "mid_attn", "mid_attn_wrap"))
    else:
        rules.update(_full_attn_rules("mid_attn", "mid_attn", "mid_attn_wrap"))
    for i in range(depth):
        rules.update(_resblock_rules(f"downs.{i}.0", f"down{i}_block1", False))
        rules.update(_resblock_rules(f"downs.{i}.1", f"down{i}_block2", False))
        rules.update(_linear_attn_rules(f"downs.{i}.2", f"down{i}_attn", f"down{i}_attn_wrap"))
        if i != depth - 1:
            rules[f"down{i}_down/Conv_0/kernel"] = (f"downs.{i}.3.weight", _conv_w)
            rules[f"down{i}_down/Conv_0/bias"] = (f"downs.{i}.3.bias", _ident)
        else:
            rules[f"down{i}_down/kernel"] = (f"downs.{i}.3.weight", _conv_w)

        j = depth - 1 - i  # torch ups index for our level i
        rules.update(_resblock_rules(f"ups.{j}.0", f"up{i}_block1", True))
        rules.update(_resblock_rules(f"ups.{j}.1", f"up{i}_block2", True))
        rules.update(_linear_attn_rules(f"ups.{j}.2", f"up{i}_attn", f"up{i}_attn_wrap"))
        if i != 0:
            rules[f"up{i}_up/Conv_0/kernel"] = (f"ups.{j}.3.1.weight", _conv_w)
            rules[f"up{i}_up/Conv_0/bias"] = (f"ups.{j}.3.1.bias", _ident)
        else:
            rules[f"up{i}_up/kernel"] = (f"ups.{j}.3.weight", _conv_w)
    return rules


def _naf_block_rules(
    torch_prefix: str, flax_prefix: str, mlps=(("mlp", "Dense_0"),)
) -> Dict[str, Rule]:
    """Shared NAFBlock body; ``mlps`` lists (torch Sequential name, flax
    Dense name) pairs — base/stereo use ``mlp``->``Dense_0``, bokeh adds
    ``time_mlp``/``cam_mlp`` named Dense modules."""
    r: Dict[str, Rule] = {
        f"{flax_prefix}/beta": (f"{torch_prefix}.beta", _norm_g),
        f"{flax_prefix}/gamma": (f"{torch_prefix}.gamma", _norm_g),
        f"{flax_prefix}/norm1/g": (f"{torch_prefix}.norm1.g", _norm_g),
        f"{flax_prefix}/norm2/g": (f"{torch_prefix}.norm2.g", _norm_g),
    }
    for tname, fname in mlps:
        r[f"{flax_prefix}/{fname}/kernel"] = (f"{torch_prefix}.{tname}.1.weight", _dense_w)
        r[f"{flax_prefix}/{fname}/bias"] = (f"{torch_prefix}.{tname}.1.bias", _ident)
    for conv_name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
        r[f"{flax_prefix}/{conv_name}/kernel"] = (f"{torch_prefix}.{conv_name}.weight", _conv_w)
        r[f"{flax_prefix}/{conv_name}/bias"] = (f"{torch_prefix}.{conv_name}.bias", _ident)
    r[f"{flax_prefix}/sca_conv/kernel"] = (f"{torch_prefix}.sca.1.weight", _conv_w)
    r[f"{flax_prefix}/sca_conv/bias"] = (f"{torch_prefix}.sca.1.bias", _ident)
    return r


def nafnet_key_rules(
    enc_blk_nums, middle_blk_num, dec_blk_nums
) -> Dict[str, Rule]:
    """flax path -> torch key for ConditionalNAFNet (DenoisingNAFNet_arch.py:87-188)."""
    naf_block = _naf_block_rules

    rules: Dict[str, Rule] = {
        "intro/kernel": ("intro.weight", _conv_w),
        "intro/bias": ("intro.bias", _ident),
        "ending/kernel": ("ending.weight", _conv_w),
        "ending/bias": ("ending.bias", _ident),
        "time_mlp_1/kernel": ("time_mlp.1.weight", _dense_w),
        "time_mlp_1/bias": ("time_mlp.1.bias", _ident),
        "time_mlp_2/kernel": ("time_mlp.3.weight", _dense_w),
        "time_mlp_2/bias": ("time_mlp.3.bias", _ident),
    }
    for i, num in enumerate(enc_blk_nums):
        for b in range(num):
            rules.update(naf_block(f"encoders.{i}.{b}", f"enc{i}_block{b}"))
        rules[f"down{i}/kernel"] = (f"downs.{i}.weight", _conv_w)
        rules[f"down{i}/bias"] = (f"downs.{i}.bias", _ident)
    for b in range(middle_blk_num):
        rules.update(naf_block(f"middle_blks.{b}", f"mid_block{b}"))
    for i, num in enumerate(dec_blk_nums):
        rules[f"up{i}/kernel"] = (f"ups.{i}.0.weight", _conv_w)
        for b in range(num):
            rules.update(naf_block(f"decoders.{i}.{b}", f"dec{i}_block{b}"))
    return rules


def apply_rules(flax_params, state_dict: Dict[str, np.ndarray], rules: Dict[str, Rule]):
    """Return a new flax params pytree with leaves replaced per ``rules``.

    Every flax leaf must be covered and every transform must produce the
    existing leaf's shape — loud failure on architecture drift (mirrors
    torch ``strict_load`` semantics, ref base_model.py:97-105).
    """
    import jax
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    flat, treedef = tree_flatten_with_path(flax_params)
    new_leaves = []
    missing = []
    for path, leaf in flat:
        keys = [str(k.key) for k in path]
        if keys and keys[0] in ("params",):
            keys = keys[1:]
        fpath = "/".join(keys)
        if fpath not in rules:
            missing.append(fpath)
            new_leaves.append(leaf)
            continue
        tkey, tf = rules[fpath]
        w = tf(np.asarray(state_dict[tkey]))
        if w.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {fpath}: torch {w.shape} vs flax {leaf.shape}")
        new_leaves.append(w.astype(np.float32))
    if missing:
        raise ValueError(f"no torch mapping for flax params: {missing[:10]} (+{max(0,len(missing)-10)} more)")
    return tree_unflatten(treedef, new_leaves)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth``, strip ``module.`` prefixes, return numpy.

    Ref: base_model.py:97-105 (load_network).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[7:]
        out[k] = v.detach().numpy()
    return out


def latent_unet_key_rules(depth: int = 4) -> Dict[str, Rule]:
    """flax path -> torch key for the latent compressor UNet (UNet_arch.py:17-97).

    torch ``decoder`` was built with insert(0), so torch index k maps to
    level depth-1-k.
    """
    rules: Dict[str, Rule] = {
        "init_conv/kernel": ("init_conv.weight", _conv_w),
        "latent_conv/kernel": ("latent_conv.weight", _conv_w),
        "post_latent_conv/kernel": ("post_latent_conv.weight", _conv_w),
        "final_conv/kernel": ("final_conv.weight", _conv_w),
        "final_conv/bias": ("final_conv.bias", _ident),
    }
    for i in range(depth):
        rules.update(_resblock_rules_nt(f"encoder.{i}.0", f"enc{i}_block1", False))
        rules.update(_resblock_rules_nt(f"encoder.{i}.1", f"enc{i}_block2", False))
        if i == depth - 1:
            rules.update(_linear_attn_rules(f"encoder.{i}.2", f"enc{i}_attn", f"enc{i}_attn_wrap"))
            rules[f"enc{i}_down/kernel"] = (f"encoder.{i}.3.weight", _conv_w)
        else:
            rules[f"enc{i}_down/Conv_0/kernel"] = (f"encoder.{i}.3.weight", _conv_w)
            rules[f"enc{i}_down/Conv_0/bias"] = (f"encoder.{i}.3.bias", _ident)

        k = depth - 1 - i  # torch decoder index for our level i
        rules.update(_resblock_rules_nt(f"decoder.{k}.0", f"dec{i}_block1", True))
        rules.update(_resblock_rules_nt(f"decoder.{k}.1", f"dec{i}_block2", True))
        if i == depth - 1:
            rules.update(_linear_attn_rules(f"decoder.{k}.2", f"dec{i}_attn", f"dec{i}_attn_wrap"))
        if i == 0:
            rules[f"dec{i}_up/kernel"] = (f"decoder.{k}.3.weight", _conv_w)
        else:
            rules[f"dec{i}_up/Conv_0/kernel"] = (f"decoder.{k}.3.1.weight", _conv_w)
            rules[f"dec{i}_up/Conv_0/bias"] = (f"decoder.{k}.3.1.bias", _ident)
    return rules


def _scam_rules(torch_prefix: str, flax_prefix: str) -> Dict[str, Rule]:
    """Stereo Cross Attention Module (ref stereo-sr arch :15-60)."""
    r: Dict[str, Rule] = {
        f"{flax_prefix}/norm_l/g": (f"{torch_prefix}.norm_l.g", _norm_g),
        f"{flax_prefix}/norm_r/g": (f"{torch_prefix}.norm_r.g", _norm_g),
        f"{flax_prefix}/beta": (f"{torch_prefix}.beta", _norm_g),
        f"{flax_prefix}/gamma": (f"{torch_prefix}.gamma", _norm_g),
    }
    for proj in ("l_proj1", "r_proj1", "l_proj2", "r_proj2"):
        r[f"{flax_prefix}/{proj}/kernel"] = (f"{torch_prefix}.{proj}.weight", _conv_w)
        r[f"{flax_prefix}/{proj}/bias"] = (f"{torch_prefix}.{proj}.bias", _ident)
    return r


def stereo_nafnet_key_rules(
    enc_blk_nums, middle_blk_num, dec_blk_nums
) -> Dict[str, Rule]:
    """flax path -> torch key for the stereo ConditionalNAFNet
    (stereo-sr/models/modules/DenoisingNAFNet_arch.py:63-248): each torch
    NAFBlock carries its SCAM as ``.fusion``; our StereoNAFBlock nests them
    as ``block`` / ``fusion``."""

    def stereo_block(tp: str, fp: str) -> Dict[str, Rule]:
        r = _naf_block_rules(tp, f"{fp}/block")
        r.update(_scam_rules(f"{tp}.fusion", f"{fp}/fusion"))
        return r

    rules: Dict[str, Rule] = {
        "intro/kernel": ("intro.weight", _conv_w),
        "intro/bias": ("intro.bias", _ident),
        "ending/kernel": ("ending.weight", _conv_w),
        "ending/bias": ("ending.bias", _ident),
        "time_mlp_1/kernel": ("time_mlp.1.weight", _dense_w),
        "time_mlp_1/bias": ("time_mlp.1.bias", _ident),
        "time_mlp_2/kernel": ("time_mlp.3.weight", _dense_w),
        "time_mlp_2/bias": ("time_mlp.3.bias", _ident),
    }
    for i, num in enumerate(enc_blk_nums):
        for b in range(num):
            rules.update(stereo_block(f"encoders.{i}.{b}", f"enc{i}_block{b}"))
        rules[f"down{i}/kernel"] = (f"downs.{i}.weight", _conv_w)
        rules[f"down{i}/bias"] = (f"downs.{i}.bias", _ident)
    for b in range(middle_blk_num):
        rules.update(stereo_block(f"middle_blks.{b}", f"mid_block{b}"))
    for i, num in enumerate(dec_blk_nums):
        rules[f"up{i}/kernel"] = (f"ups.{i}.0.weight", _conv_w)
        for b in range(num):
            rules.update(stereo_block(f"decoders.{i}.{b}", f"dec{i}_block{b}"))
    return rules


def bokeh_nafnet_key_rules(
    enc_blk_nums, middle_blk_num, dec_blk_nums
) -> Dict[str, Rule]:
    """flax path -> torch key for the bokeh ConditionalNAFNet
    (latent-bokeh/models/modules/DenoisingNAFNet_arch.py:93-208).

    Unlike the base variant, the top-level time_mlp is
    Sequential(Linear, SimpleGate, Linear) — indices 0/2, the sinusoid is a
    separate module — and there is a parallel ``cam_mlp``; blocks carry
    named ``time_mlp``/``cam_mlp`` Sequential(SimpleGate, Linear) pairs."""

    def bokeh_block(tp: str, fp: str) -> Dict[str, Rule]:
        return _naf_block_rules(
            tp, fp, mlps=(("time_mlp", "time_mlp"), ("cam_mlp", "cam_mlp"))
        )

    rules: Dict[str, Rule] = {
        "intro/kernel": ("intro.weight", _conv_w),
        "intro/bias": ("intro.bias", _ident),
        "ending/kernel": ("ending.weight", _conv_w),
        "ending/bias": ("ending.bias", _ident),
        "time_mlp_1/kernel": ("time_mlp.0.weight", _dense_w),
        "time_mlp_1/bias": ("time_mlp.0.bias", _ident),
        "time_mlp_2/kernel": ("time_mlp.2.weight", _dense_w),
        "time_mlp_2/bias": ("time_mlp.2.bias", _ident),
        "cam_mlp_1/kernel": ("cam_mlp.0.weight", _dense_w),
        "cam_mlp_1/bias": ("cam_mlp.0.bias", _ident),
        "cam_mlp_2/kernel": ("cam_mlp.2.weight", _dense_w),
        "cam_mlp_2/bias": ("cam_mlp.2.bias", _ident),
    }
    for i, num in enumerate(enc_blk_nums):
        for b in range(num):
            rules.update(bokeh_block(f"encoders.{i}.{b}", f"enc{i}_block{b}"))
        rules[f"down{i}/kernel"] = (f"downs.{i}.weight", _conv_w)
        rules[f"down{i}/bias"] = (f"downs.{i}.bias", _ident)
    for b in range(middle_blk_num):
        rules.update(bokeh_block(f"middle_blks.{b}", f"mid_block{b}"))
    for i, num in enumerate(dec_blk_nums):
        rules[f"up{i}/kernel"] = (f"ups.{i}.0.weight", _conv_w)
        for b in range(num):
            rules.update(bokeh_block(f"decoders.{i}.{b}", f"dec{i}_block{b}"))
    return rules


def dit_key_rules(depth: int = 28) -> Dict[str, Rule]:
    """flax path -> torch key for DiT (latent-dehazing/.../DiT_arch.py:186-308).

    torch blocks use timm Attention (fused qkv with bias) + Mlp (fc1/fc2);
    the adaLN Sequential is (SiLU, Linear) -> index 1.  LayerNorms are
    elementwise_affine=False (no params) on both sides."""
    rules: Dict[str, Rule] = {
        "patch_embed/kernel": ("patch_embed.proj.weight", _conv_w),
        "patch_embed/bias": ("patch_embed.proj.bias", _ident),
        "t_mlp_1/kernel": ("t_embedder.mlp.0.weight", _dense_w),
        "t_mlp_1/bias": ("t_embedder.mlp.0.bias", _ident),
        "t_mlp_2/kernel": ("t_embedder.mlp.2.weight", _dense_w),
        "t_mlp_2/bias": ("t_embedder.mlp.2.bias", _ident),
        "final_adaLN/kernel": ("final_layer.adaLN_modulation.1.weight", _dense_w),
        "final_adaLN/bias": ("final_layer.adaLN_modulation.1.bias", _ident),
        "final_linear/kernel": ("final_layer.linear.weight", _dense_w),
        "final_linear/bias": ("final_layer.linear.bias", _ident),
    }
    for i in range(depth):
        tp, fp = f"blocks.{i}", f"block{i}"
        rules.update({
            f"{fp}/adaLN/kernel": (f"{tp}.adaLN_modulation.1.weight", _dense_w),
            f"{fp}/adaLN/bias": (f"{tp}.adaLN_modulation.1.bias", _ident),
            f"{fp}/MHA_0/qkv/kernel": (f"{tp}.attn.qkv.weight", _dense_w),
            f"{fp}/MHA_0/qkv/bias": (f"{tp}.attn.qkv.bias", _ident),
            f"{fp}/MHA_0/proj/kernel": (f"{tp}.attn.proj.weight", _dense_w),
            f"{fp}/MHA_0/proj/bias": (f"{tp}.attn.proj.bias", _ident),
            f"{fp}/Dense_0/kernel": (f"{tp}.mlp.fc1.weight", _dense_w),
            f"{fp}/Dense_0/bias": (f"{tp}.mlp.fc1.bias", _ident),
            f"{fp}/Dense_1/kernel": (f"{tp}.mlp.fc2.weight", _dense_w),
            f"{fp}/Dense_1/bias": (f"{tp}.mlp.fc2.bias", _ident),
        })
    return rules


_DIT_DEPTHS = {"S": 12, "B": 12, "L": 24, "XL": 28}


def rules_for_network(which: str, setting: dict) -> Dict[str, Rule]:
    """Key rules for a registry network name + YAML ``setting`` dict — the
    dispatch used by the task runners when ``pretrain_model_G`` is a ``.pth``."""
    setting = dict(setting or {})
    if which == "ConditionalUNet":
        return unet_key_rules(
            int(setting.get("depth", 4)),
            conditional=setting.get("conditional", True) is not False,
        )
    if which in ("ConditionalNAFNet", "CNAFNetLocal"):
        return nafnet_key_rules(
            setting.get("enc_blk_nums", ()), int(setting.get("middle_blk_num", 1)),
            setting.get("dec_blk_nums", ()),
        )
    if which == "StereoConditionalNAFNet":
        return stereo_nafnet_key_rules(
            setting.get("enc_blk_nums", ()), int(setting.get("middle_blk_num", 1)),
            setting.get("dec_blk_nums", ()),
        )
    if which == "BokehConditionalNAFNet":
        return bokeh_nafnet_key_rules(
            setting.get("enc_blk_nums", ()), int(setting.get("middle_blk_num", 1)),
            setting.get("dec_blk_nums", ()),
        )
    if which == "UNet":
        return latent_unet_key_rules(len(setting.get("ch_mult") or [1, 2, 4, 4]))
    if which == "DiT" or which.startswith("DiT_"):
        if "depth" in setting:
            depth = int(setting["depth"])
        else:  # DiT_{S,B,L,XL}_{p} ladder names
            depth = _DIT_DEPTHS[which.split("_")[1]]
        return dit_key_rules(depth)
    raise ValueError(f"no torch import rules for network {which!r}")


def _resblock_rules_nt(torch_prefix: str, flax_prefix: str, has_res_conv: bool) -> Dict[str, Rule]:
    """ResBlock without time MLP (latent compressor blocks)."""
    rules = {
        f"{flax_prefix}/Block_0/Conv_0/kernel": (f"{torch_prefix}.block1.proj.weight", _conv_w),
        f"{flax_prefix}/Block_1/Conv_0/kernel": (f"{torch_prefix}.block2.proj.weight", _conv_w),
    }
    if has_res_conv:
        rules[f"{flax_prefix}/Conv_0/kernel"] = (f"{torch_prefix}.res_conv.weight", _conv_w)
    return rules
