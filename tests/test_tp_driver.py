"""Driver-level tensor-parallel test: a user trains with TP from a config.

Round-2 gap: ``shape_based_tp_sharding`` was numerically equivalence-tested
(tests/test_parallel.py) but unreachable from ``tools/train.py``.  Now the
YAML key ``train.model_parallel`` (or env ``IRSDE_TP``) sizes the mesh's
'model' axis.  This test runs the real driver twice on the virtual 8-device
CPU platform — dp-only (1x8) vs dp4 x tp2 — with the same seed and asserts
per-iter loss parity, proving the sharded path computes the same training
trajectory end to end.
"""

import os
import re
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_dataset(root):
    from PIL import Image

    rs = np.random.RandomState(0)
    for sub in ["GT", "LQ"]:
        os.makedirs(root / "train" / sub, exist_ok=True)
    for i in range(8):
        gt = (rs.rand(24, 24, 3) * 255).astype(np.uint8)
        lq = np.clip(gt.astype(int) + 30, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(root / "train" / "GT" / f"im{i}.png")
        Image.fromarray(lq).save(root / "train" / "LQ" / f"im{i}.png")


def _config(tmp_path, name, model_parallel=None):
    # nf=16 -> time-MLP kernels have trailing dim 64: the shape rule
    # column-shards them over 'model' (min_last=64), so tp2 is not a no-op
    train = {"optimizer": "Adam", "lr_G": 1e-3, "lr_scheme": "MultiStepLR",
             "beta1": 0.9, "beta2": 0.99, "niter": 3, "warmup_iter": -1,
             "lr_steps": [], "is_weighted": False, "loss_type": "l1",
             "weight": 1.0, "manual_seed": 1, "val_freq": 100}
    if model_parallel:
        train["model_parallel"] = model_parallel
    return {
        "name": name, "use_tb_logger": False, "model": "denoising",
        "distortion": "derain", "gpu_ids": [0],
        "sde": {"max_sigma": 10, "T": 4, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "sde"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {
            "train": {"name": "t", "mode": "LQGT",
                      "dataroot_GT": str(tmp_path / "train" / "GT"),
                      "dataroot_LQ": str(tmp_path / "train" / "LQ"),
                      "n_workers": 1, "batch_size": 8, "GT_size": 16,
                      "LR_size": 16, "use_flip": True, "use_rot": True,
                      "dataset_enlarge_ratio": 4},
        },
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 16, "depth": 2}},
        "path": {"root": str(tmp_path / f"run_{name}")},
        "train": train,
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
    }


def _run(tmp_path, cfg):
    opt_path = tmp_path / f"{cfg['name']}.yml"
    yaml.safe_dump(cfg, open(opt_path, "w"))
    env = dict(os.environ)
    env.update({
        "IRSDE_PLATFORM": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache"),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.pop("IRSDE_TP", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"), f"-opt={opt_path}"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-3000:]
    out = res.stdout + res.stderr
    return out, [float(m) for m in re.findall(r"loss: ([0-9.e+-]+)", out)]


def test_tp_from_config_matches_dp(tmp_path):
    _write_dataset(tmp_path)
    out_dp, losses_dp = _run(tmp_path, _config(tmp_path, "dp"))
    out_tp, losses_tp = _run(tmp_path, _config(tmp_path, "tp", model_parallel=2))

    assert "Tensor parallel" not in out_dp
    assert "Tensor parallel: mesh {'data': 4, 'model': 2}" in out_tp

    assert len(losses_dp) == 3 and len(losses_tp) == 3
    assert all(np.isfinite(losses_dp)) and all(np.isfinite(losses_tp))
    # same data order (same seed), same math: sharded kernels only change
    # the reduction split, so per-iter losses agree tightly
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-3, atol=1e-6)
