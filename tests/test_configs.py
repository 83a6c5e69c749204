"""Config-library parity: every reference option file has a generated
counterpart under configs/ that parses through utils/options.py and builds
through runners.build_task (VERDICT r1 items 3/4 — 33/33 YAML surface).

Reference layout: codes/config/<task>/options/[<sub>/]{train,test}/<name>.yml
Repo layout:      configs/<task>/{train,test}/<name>.yml
(with the single rename denoising-sde -> denoising).
"""

import copy
import glob
import os

import jax
import pytest

from image_restoration_sde_tpu.parallel import make_mesh
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.utils import options

REF = "/root/reference/codes/config"
REPO = os.path.join(os.path.dirname(__file__), "..", "configs")
TASK_RENAME = {"denoising-sde": "denoising"}


def ref_option_files():
    return sorted(glob.glob(os.path.join(REF, "*", "options", "**", "*.yml"), recursive=True))


def counterpart(ref_path: str) -> str:
    rel = os.path.relpath(ref_path, REF)
    parts = rel.split(os.sep)  # <task>/options/[sub/]<phase>/<name>.yml
    task = TASK_RENAME.get(parts[0], parts[0])
    phase, name = parts[-2], parts[-1]
    return os.path.join(REPO, task, phase, name)


def test_reference_yaml_surface_is_complete():
    refs = ref_option_files()
    assert len(refs) == 33
    missing = [r for r in refs if not os.path.exists(counterpart(r))]
    assert not missing, f"missing counterparts for: {missing}"


def _shrink(opt):
    """Tiny-net overrides so build_task compiles fast on the CPU mesh."""
    net_keys = [k for k in ("network_G", "network_L") if opt.get(k)]
    for k in net_keys:
        s = opt[k]["setting"]
        for key, small in (
            ("nf", 8), ("width", 8), ("ch", 4), ("embed_dim", 4),
            ("depth", 2), ("middle_blk_num", 1), ("hidden_size", 32),
        ):
            if key in s:
                s[key] = small
        for key in ("enc_blk_nums", "dec_blk_nums"):
            if key in s:
                s[key] = [1] * min(len(s[key]), 2)
        if "ch_mult" in s:
            s["ch_mult"] = s["ch_mult"][:2]
    dsets = opt.get("datasets") or {}
    for d in dsets.values():
        if isinstance(d, dict):
            d["GT_size"] = 32
            d["batch_size"] = 2
    if opt.get("sde"):
        opt["sde"]["T"] = 4
        opt["sde"].setdefault("schedule", "cosine")
        opt["sde"].setdefault("eps", 0.005)
    return opt


def _build_signature(opt):
    """Fields that select the build path: the build_task branch (model type +
    GT-only gaussian-denoising detection) and the network class (incl. the
    stereo/bokeh dataset-mode rewrites)."""
    which_g = (opt.get("network_G") or {}).get("which_model_G") or (
        opt.get("network_G") or {}
    ).get("which_model")
    modes = {
        d.get("mode", "") for d in (opt.get("datasets") or {}).values() if isinstance(d, dict)
    }
    stereo = any(m.startswith("Ste") for m in modes)
    bokeh = any(m.startswith("Bokeh") for m in modes)
    gt_only = modes <= {"GT"} or opt.get("distortion") == "denoising"
    return (opt.get("model"), which_g, stereo, bokeh, gt_only)


@pytest.mark.parametrize("ref_path", ref_option_files(), ids=lambda p: os.path.relpath(p, REF))
def test_counterpart_parses(ref_path):
    path = counterpart(ref_path)
    is_train = os.path.basename(os.path.dirname(path)) == "train"
    opt = options.parse(path, is_train=is_train)
    assert opt["model"] in ("denoising", "latent", "latent_denoising", "sde")
    assert opt.get("network_G"), path


def test_every_build_path_builds():
    """Smoke-build one tiny task per unique build signature across the full
    33-file surface (full-size builds would dominate the suite; the build
    path is identical across same-signature configs)."""
    built = set()
    mesh = make_mesh()
    for ref_path in ref_option_files():
        path = counterpart(ref_path)
        is_train = os.path.basename(os.path.dirname(path)) == "train"
        opt = options.parse(path, is_train=is_train)
        sig = _build_signature(opt)
        if sig in built:
            continue
        built.add(sig)
        small = _shrink(copy.deepcopy(opt))
        nd = options.dict_to_nonedict(small)
        task = build_task(nd, mesh, seed=0, base_key=jax.random.PRNGKey(0))
        assert task.n_params() > 0, ref_path
    assert len(built) >= 7  # pixel UNet/NAF, stereo, gaussian, compressor, latent, bokeh
