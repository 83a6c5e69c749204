"""Import reference PyTorch checkpoints (.pth) into Flax parameter trees.

Lets users of the reference repo (Algolzw/image-restoration-sde) bring their
trained weights: maps the reference ``state_dict`` key space onto this
framework's module tree with the required layout transposes
(OIHW -> HWIO convs, (out,in) -> (in,out) dense, (1,C,1,1) -> (C,) norms).

Torch is only needed when actually loading a ``.pth`` (lazy import); the
key-mapping itself is pure and is unit-tested against numpy dicts.

Supported: ConditionalUNet (DenoisingUNet_arch.py), ConditionalNAFNet
(DenoisingNAFNet_arch.py), latent compressor UNet (UNet_arch.py).
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


def unet_key_rules(depth: int = 4) -> Dict[str, Rule]:
    """flax path -> (torch state_dict key, transform) for ConditionalUNet.

    Reference layout: DenoisingUNet_arch.py:49-76 — ``downs.{i}.{0,1,2,3}``,
    ``ups.{j}`` built with insert(0) so torch index j covers level
    ``depth-1-j``.
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
    rules.update(_linear_attn_rules("mid_attn", "mid_attn", "mid_attn_wrap"))
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


def nafnet_key_rules(
    enc_blk_nums, middle_blk_num, dec_blk_nums
) -> Dict[str, Rule]:
    """flax path -> torch key for ConditionalNAFNet (DenoisingNAFNet_arch.py:87-188)."""

    def naf_block(torch_prefix: str, flax_prefix: str) -> Dict[str, Rule]:
        r = {
            f"{flax_prefix}/Dense_0/kernel": (f"{torch_prefix}.mlp.1.weight", _dense_w),
            f"{flax_prefix}/Dense_0/bias": (f"{torch_prefix}.mlp.1.bias", _ident),
            f"{flax_prefix}/beta": (f"{torch_prefix}.beta", _norm_g),
            f"{flax_prefix}/gamma": (f"{torch_prefix}.gamma", _norm_g),
            f"{flax_prefix}/norm1/g": (f"{torch_prefix}.norm1.g", _norm_g),
            f"{flax_prefix}/norm2/g": (f"{torch_prefix}.norm2.g", _norm_g),
        }
        for conv_name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
            r[f"{flax_prefix}/{conv_name}/kernel"] = (f"{torch_prefix}.{conv_name}.weight", _conv_w)
            r[f"{flax_prefix}/{conv_name}/bias"] = (f"{torch_prefix}.{conv_name}.bias", _ident)
        r[f"{flax_prefix}/sca_conv/kernel"] = (f"{torch_prefix}.sca.1.weight", _conv_w)
        r[f"{flax_prefix}/sca_conv/bias"] = (f"{torch_prefix}.sca.1.bias", _ident)
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


def _resblock_rules_nt(torch_prefix: str, flax_prefix: str, has_res_conv: bool) -> Dict[str, Rule]:
    """ResBlock without time MLP (latent compressor blocks)."""
    rules = {
        f"{flax_prefix}/Block_0/Conv_0/kernel": (f"{torch_prefix}.block1.proj.weight", _conv_w),
        f"{flax_prefix}/Block_1/Conv_0/kernel": (f"{torch_prefix}.block2.proj.weight", _conv_w),
    }
    if has_res_conv:
        rules[f"{flax_prefix}/Conv_0/kernel"] = (f"{torch_prefix}.res_conv.weight", _conv_w)
    return rules
