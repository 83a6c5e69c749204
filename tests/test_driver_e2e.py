"""End-to-end driver test: train a tiny model via tools/train.py and
evaluate it via tools/test.py, as subprocesses on the CPU platform."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_dataset(root):
    from PIL import Image

    rs = np.random.RandomState(0)
    for split in ["train", "val"]:
        for sub in ["GT", "LQ"]:
            os.makedirs(root / split / sub, exist_ok=True)
        for i in range(4):
            gt = (rs.rand(24, 24, 3) * 255).astype(np.uint8)
            lq = np.clip(gt.astype(int) + 30, 0, 255).astype(np.uint8)
            Image.fromarray(gt).save(root / split / "GT" / f"im{i}.png")
            Image.fromarray(lq).save(root / split / "LQ" / f"im{i}.png")


def _run(script, opt_path):
    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # single CPU device is fine and faster
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), f"-opt={opt_path}"],
        capture_output=True, text=True, timeout=480, env=env,
    )


def test_lpips_gated_metric_path(tmp_path, monkeypatch):
    """tools/test.py's LPIPS column is gated on the lpips package; exercise
    the present-path with a stub module (the real package isn't in this
    image) — ref test.py:74,149-150."""
    import sys as _sys
    import types

    import torch

    sys.path.insert(0, os.path.join(REPO, "tools"))
    fake = types.ModuleType("lpips")

    class LPIPS:
        def __init__(self, net):
            assert net == "alex"

        def __call__(self, a, b):
            return torch.tensor(0.123)

    fake.LPIPS = LPIPS
    monkeypatch.setitem(_sys.modules, "lpips", fake)
    import importlib

    test_mod = importlib.import_module("test")
    compute = test_mod.try_lpips()
    assert compute is not None
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.full((16, 16, 3), 255, np.uint8)
    assert compute(a, b) == pytest.approx(0.123)


def test_inference_cli_gt_plus_noise(tmp_path):
    """tools/inference.py: the denoising-sde GT+synthetic-noise flow
    (ref config/denoising-sde/inference.py:69-111) — train a tiny gaussian
    denoiser, then run inference with a --sigma override."""
    import yaml

    _write_dataset(tmp_path)
    common = {
        "sde": {"max_sigma": 50, "T": 4, "schedule": "cosine"},
        "degradation": {"sigma": 25, "noise_type": "G"},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
    }
    train_cfg = {
        "name": "dn", "use_tb_logger": False, "model": "denoising",
        "distortion": "denoising", "gpu_ids": [0], **common,
        "datasets": {
            "train": {"name": "t", "mode": "GT",
                      "dataroot_GT": str(tmp_path / "train" / "GT"),
                      "n_workers": 1, "batch_size": 2, "GT_size": 16,
                      "use_flip": True, "use_rot": True,
                      "dataset_enlarge_ratio": 4},
        },
        "path": {"root": str(tmp_path / "run")},
        "train": {"optimizer": "Adam", "lr_G": 1e-4, "lr_scheme": "MultiStepLR",
                  "beta1": 0.9, "beta2": 0.99, "niter": 3, "warmup_iter": -1,
                  "lr_steps": [], "is_weighted": True, "loss_type": "l1",
                  "weight": 1.0, "manual_seed": 1, "val_freq": 100},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 3},
    }
    opt_path = tmp_path / "dn_train.yml"
    yaml.safe_dump(train_cfg, open(opt_path, "w"))
    r = _run("train.py", opt_path)
    assert r.returncode == 0, r.stderr[-3000:]
    import glob

    hits = glob.glob(str(tmp_path / "run" / "experiments" / "*" / "dn" / "models" / "3_G"))
    assert hits, r.stderr[-2000:]

    inf_cfg = {
        "name": "dn-inf", "model": "denoising", "distortion": "denoising",
        "gpu_ids": [0], "seed": 0, **common,
        "datasets": {"test1": {"name": "noisyset", "mode": "GT",
                               "dataroot_GT": str(tmp_path / "val" / "GT")}},
        "path": {"pretrain_model_G": hits[0], "root": str(tmp_path / "run")},
    }
    opt_path2 = tmp_path / "dn_inf.yml"
    yaml.safe_dump(inf_cfg, open(opt_path2, "w"))
    env = dict(os.environ)
    env["IRSDE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "inference.py"),
         f"-opt={opt_path2}", "--sigma", "50"],
        capture_output=True, text=True, timeout=480, env=env,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "average test time" in (r2.stdout + r2.stderr)
    outs = glob.glob(str(tmp_path / "run" / "results" / "*" / "dn-inf" / "noisyset" / "*.png"))
    assert len(outs) == 4, (r2.stdout + r2.stderr)[-1500:]


def test_inpainting_train_then_test_with_generated_masks(tmp_path):
    """Inpainting runs out of the box: procedural mask bank (tools/gen_masks)
    + GT-only dataset + mask_root degradation (ref deg_utils.py:19-34 and the
    shipped gt_keep_masks layout)."""
    import yaml

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_masks

    mask_root = tmp_path / "gt_keep_masks"
    gen_masks.generate(str(mask_root), seed=0, n=4)
    assert (mask_root / "thin" / "000003.png").exists()
    assert (mask_root / "genhalf" / "000000.png").exists()

    _write_dataset(tmp_path)
    common = {
        "sde": {"max_sigma": 30, "T": 4, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "sde"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4,
                        "mask_root": str(mask_root / "thin")},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
    }
    train_cfg = {
        "name": "inp", "use_tb_logger": False, "model": "denoising",
        "distortion": "inpainting", "gpu_ids": [0], **common,
        "datasets": {
            "train": {"name": "t", "mode": "GT",
                      "dataroot_GT": str(tmp_path / "train" / "GT"),
                      "n_workers": 1, "batch_size": 2, "GT_size": 16,
                      "use_flip": True, "use_rot": True,
                      "dataset_enlarge_ratio": 4},
        },
        "path": {"root": str(tmp_path / "run")},
        "train": {"optimizer": "Adam", "lr_G": 1e-4, "lr_scheme": "MultiStepLR",
                  "beta1": 0.9, "beta2": 0.99, "niter": 3, "warmup_iter": -1,
                  "lr_steps": [], "is_weighted": False, "loss_type": "l1",
                  "weight": 1.0, "manual_seed": 1, "val_freq": 100},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 3},
    }
    opt_path = tmp_path / "inp_train.yml"
    yaml.safe_dump(train_cfg, open(opt_path, "w"))
    r = _run("train.py", opt_path)
    assert r.returncode == 0, r.stderr[-3000:]
    import glob

    hits = glob.glob(str(tmp_path / "run" / "experiments" / "*" / "inp" / "models" / "3_G"))
    assert hits, r.stderr[-2000:]

    test_cfg = {
        "name": "inp-test", "model": "denoising", "distortion": "inpainting",
        "gpu_ids": [0], "seed": 0, **common,
        "datasets": {"test1": {"name": "valset", "mode": "GT",
                               "dataroot_GT": str(tmp_path / "val" / "GT")}},
        "path": {"pretrain_model_G": hits[0], "root": str(tmp_path / "run")},
    }
    opt_path2 = tmp_path / "inp_test.yml"
    yaml.safe_dump(test_cfg, open(opt_path2, "w"))
    r2 = _run("test.py", opt_path2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "avg over 4" in (r2.stdout + r2.stderr)


def test_train_then_test_cli(tmp_path):
    _write_dataset(tmp_path)
    import yaml

    train_cfg = {
        "name": "e2e", "use_tb_logger": False, "model": "denoising",
        "distortion": "derain", "gpu_ids": [0],
        "sde": {"max_sigma": 10, "T": 4, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "sde"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {
            "train": {"name": "t", "mode": "LQGT",
                      "dataroot_GT": str(tmp_path / "train" / "GT"),
                      "dataroot_LQ": str(tmp_path / "train" / "LQ"),
                      "n_workers": 1, "batch_size": 2, "GT_size": 16,
                      "LR_size": 16, "use_flip": True, "use_rot": True,
                      "dataset_enlarge_ratio": 4},
        },
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
        "path": {"root": str(tmp_path / "run")},
        "train": {"optimizer": "Adam", "lr_G": 1e-4, "lr_scheme": "MultiStepLR",
                  "beta1": 0.9, "beta2": 0.99, "niter": 3, "warmup_iter": -1,
                  "lr_steps": [], "is_weighted": False, "loss_type": "l1",
                  "weight": 1.0, "manual_seed": 1, "val_freq": 100},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 3},
    }
    opt_path = tmp_path / "train.yml"
    yaml.safe_dump(train_cfg, open(opt_path, "w"))
    r = _run("train.py", opt_path)
    assert r.returncode == 0, r.stderr[-3000:]
    import glob

    hits = glob.glob(str(tmp_path / "run" / "experiments" / "*" / "e2e" / "models" / "3_G"))
    assert hits, r.stderr[-2000:]
    ckpt = hits[0]

    test_cfg = {
        "name": "e2e-test", "model": "denoising", "distortion": "derain",
        "gpu_ids": [0], "seed": 0,
        "sde": {"max_sigma": 10, "T": 4, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "posterior"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {"test1": {"name": "valset", "mode": "LQGT",
                               "dataroot_GT": str(tmp_path / "val" / "GT"),
                               "dataroot_LQ": str(tmp_path / "val" / "LQ")}},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
        "path": {"pretrain_model_G": ckpt, "root": str(tmp_path / "run")},
    }
    opt_path2 = tmp_path / "test.yml"
    yaml.safe_dump(test_cfg, open(opt_path2, "w"))
    r2 = _run("test.py", opt_path2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "avg over 4" in (r2.stdout + r2.stderr)

    # tiled-device eval: the whole tile loop as one jitted program
    # (tiling.tiled_restore_device via the tile_device YAML key)
    test_cfg.update({"name": "e2e-test-tiled", "tile": 16, "tile_overlap": 4,
                     "tile_batch": 2, "tile_device": True})
    opt_path3 = tmp_path / "test_tiled.yml"
    yaml.safe_dump(test_cfg, open(opt_path3, "w"))
    r3 = _run("test.py", opt_path3)
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "avg over 4" in (r3.stdout + r3.stderr)


def test_stereo_train_validate_then_test(tmp_path):
    """Stereo SR end to end: SteLQGT data (2i/2i+1 eye pairs), the stereo
    NAFNet routed from `ConditionalNAFNet` + Ste mode, a validation pass
    (6-channel outputs must split into _L/_R eyes for saving — regression
    for the cv2 6-channel imwrite crash), then tools/test.py with per-eye
    metrics (ref stereo-sr test.py:105-124)."""
    import glob

    import yaml
    from PIL import Image

    rs = np.random.RandomState(5)
    for split in ["train", "val"]:
        for sub in ["HR", "LR_x4"]:
            os.makedirs(tmp_path / split / sub, exist_ok=True)
        for i in range(4):  # 2 pairs
            hr = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(hr).save(tmp_path / split / "HR" / f"{i:04d}.png")
            lr = np.asarray(Image.fromarray(hr).resize((8, 8)))
            Image.fromarray(lr).save(tmp_path / split / "LR_x4" / f"{i:04d}.png")

    common = {
        "sde": {"max_sigma": 50, "T": 4, "schedule": "cosine", "eps": 0.005},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "network_G": {"which_model_G": "ConditionalNAFNet",
                      "setting": {"width": 8, "enc_blk_nums": [1, 1],
                                  "middle_blk_num": 1, "dec_blk_nums": [1, 1]}},
    }
    train_cfg = {
        "name": "ssr", "use_tb_logger": False, "model": "denoising",
        "distortion": "sr", "gpu_ids": [0], **common,
        "datasets": {
            "train": {"name": "t", "mode": "SteLQGT",
                      "dataroot_GT": str(tmp_path / "train" / "HR"),
                      "dataroot_LQ": str(tmp_path / "train" / "LR_x4"),
                      "n_workers": 1, "batch_size": 2, "GT_size": 32,
                      "LR_size": 8, "scale": 4, "use_flip": True,
                      "use_rot": True, "dataset_enlarge_ratio": 4},
            "val": {"name": "v", "mode": "SteLQGT",
                    "dataroot_GT": str(tmp_path / "val" / "HR"),
                    "dataroot_LQ": str(tmp_path / "val" / "LR_x4"),
                    "scale": 4, "max_images": 1},
        },
        "path": {"root": str(tmp_path / "run")},
        "train": {"optimizer": "Adam", "lr_G": 1e-4, "lr_scheme": "MultiStepLR",
                  "beta1": 0.9, "beta2": 0.99, "niter": 2, "warmup_iter": -1,
                  "lr_steps": [], "is_weighted": False, "loss_type": "l1",
                  "weight": 1.0, "manual_seed": 1, "val_freq": 2},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
    }
    opt_path = tmp_path / "ssr_train.yml"
    yaml.safe_dump(train_cfg, open(opt_path, "w"))
    r = _run("train.py", opt_path)
    assert r.returncode == 0, r.stderr[-3000:]
    # validation ran and saved split eyes
    val_imgs = glob.glob(str(tmp_path / "run" / "experiments" / "*" / "ssr" / "val_images" / "*_L.png"))
    assert val_imgs, r.stderr[-2000:]

    hits = glob.glob(str(tmp_path / "run" / "experiments" / "*" / "ssr" / "models" / "2_G"))
    assert hits
    test_cfg = {
        "name": "ssr-test", "model": "denoising", "distortion": "sr",
        "gpu_ids": [0], "seed": 0, **common,
        "datasets": {"test1": {"name": "vset", "mode": "SteLQGT",
                               "dataroot_GT": str(tmp_path / "val" / "HR"),
                               "dataroot_LQ": str(tmp_path / "val" / "LR_x4"),
                               "scale": 4}},
        "path": {"pretrain_model_G": hits[0], "root": str(tmp_path / "run")},
    }
    opt_path2 = tmp_path / "ssr_test.yml"
    yaml.safe_dump(test_cfg, open(opt_path2, "w"))
    r2 = _run("test.py", opt_path2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = r2.stdout + r2.stderr
    assert "avg over 2" in out, out[-1500:]
    eyes = glob.glob(str(tmp_path / "run" / "results" / "*" / "ssr-test" / "vset" / "*_L.png"))
    assert eyes, out[-1500:]
