"""Data-pipeline tests: matlab/torch resize goldens, metrics goldens,
dataset semantics (pairing, crops, augment determinism), loader sharding."""

import os

import numpy as np
import pytest

from image_restoration_sde_tpu.data import create_dataset
from image_restoration_sde_tpu.data.imresize import imresize, torch_bicubic_resize
from image_restoration_sde_tpu.data.loader import EvalLoader, TrainLoader
from image_restoration_sde_tpu.data.transforms import augment, modcrop, rgb2ycbcr
from image_restoration_sde_tpu.utils.metrics import calculate_psnr, calculate_ssim


def ramp_image(H=4, W=6):
    return (np.arange(H * W * 3).reshape(H, W, 3) % 17).astype(np.float32) / 16.0


def test_imresize_matlab_golden():
    # golden from the reference's torch imresize (data/util.py:240-387)
    got = imresize(ramp_image(), 0.5, antialias=True)
    want_ch0 = np.array(
        [[0.11303711, 0.5002823, 0.85030365], [0.24291992, 0.6745224, 0.46268463]],
        dtype=np.float32,
    )
    assert got.shape == (2, 3, 3)
    np.testing.assert_allclose(got[:, :, 0], want_ch0, atol=2e-6)


def test_torch_bicubic_golden():
    # golden from torch F.interpolate(mode='bicubic') (deg_utils.py:38-40)
    got = torch_bicubic_resize(ramp_image(), 2.0)
    want_row0_ch0 = np.array(
        [-0.02636719, 0.02929688, 0.11865234, 0.23657227, 0.31274414, 0.42407227,
         0.50024414, 0.61157227, 0.68774414, 0.80566406, 0.89501953, 0.9506836],
        dtype=np.float32,
    )
    assert got.shape == (8, 12, 3)
    np.testing.assert_allclose(got[0, :, 0], want_row0_ch0, atol=2e-6)


def test_metrics_golden():
    rs = np.random.RandomState(3)
    a = (rs.rand(32, 32, 3) * 255).round().astype(np.float64)
    b = np.clip(a + rs.randn(32, 32, 3) * 12, 0, 255).round().astype(np.float64)
    np.testing.assert_allclose(calculate_psnr(a, b), 26.884004119276167, rtol=1e-9)
    np.testing.assert_allclose(calculate_ssim(a, b), 0.9869369995794404, rtol=1e-6)
    assert calculate_psnr(a, a) == float("inf")


def test_rgb2ycbcr_range_and_gray():
    img = np.ones((4, 4, 3), np.float32)
    y = rgb2ycbcr(img, only_y=True)
    np.testing.assert_allclose(y, (16 + (65.481 + 128.553 + 24.966)) / 255.0, rtol=1e-5)


def test_modcrop_and_augment():
    img = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    assert modcrop(img, 4).shape == (4, 4, 3)
    rng = np.random.default_rng(0)
    a, b = augment([img.copy(), img.copy()], True, True, False, rng)
    np.testing.assert_array_equal(a, b)  # joint transform
    # swap flips the list order for paired data
    outs = [augment([img * 0, img * 0 + 1], False, False, True, np.random.default_rng(s))
            for s in range(20)]
    firsts = {float(o[0].mean()) for o in outs}
    assert firsts == {0.0, 1.0}  # both orders occur


# ------------------------------------------------------------ dataset + IO
@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("derain")
    rs = np.random.RandomState(0)
    for sub in ["GT", "LQ"]:
        os.makedirs(root / sub)
        for i in range(6):
            arr = (rs.rand(40, 48, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / sub / f"img_{i:03d}.png")
    return root


def _lqgt_opt(root, phase="train", **kw):
    opt = {
        "phase": phase,
        "mode": "LQGT",
        "dataroot_GT": str(root / "GT"),
        "dataroot_LQ": str(root / "LQ"),
        "data_type": "img",
        "scale": 1,
        "GT_size": 16,
        "LR_size": 16,
        "use_flip": True,
        "use_rot": True,
    }
    opt.update(kw)
    return opt


def test_lqgt_dataset_train(img_root):
    ds = create_dataset(_lqgt_opt(img_root))
    assert len(ds) == 6
    ds.set_epoch_seed((0, 0))
    s = ds[0]
    assert s["LQ"].shape == (16, 16, 3) and s["GT"].shape == (16, 16, 3)
    assert s["LQ"].dtype == np.float32
    # deterministic per (seed, index)
    s2 = ds[0]
    np.testing.assert_array_equal(s["LQ"], s2["LQ"])
    ds.set_epoch_seed((0, 1))
    s3 = ds[0]
    assert not np.array_equal(s["LQ"], s3["LQ"])


def test_lqgt_dataset_onthefly_downscale(img_root):
    opt = _lqgt_opt(img_root, phase="val", scale=2)
    opt.pop("dataroot_LQ")
    opt["GT_size"] = None
    opt["LR_size"] = None
    ds = create_dataset(opt)
    s = ds[0]
    # modcrop to scale, then matlab 1/2 downscale
    assert s["GT"].shape == (40, 48, 3)
    assert s["LQ"].shape == (20, 24, 3)


def test_train_loader_shards_and_shapes(img_root):
    ds = create_dataset(_lqgt_opt(img_root))
    loaders = [
        TrainLoader(ds, batch_size=4, seed=1, ratio=10, num_workers=2,
                    process_index=i, process_count=2)
        for i in range(2)
    ]
    # index plans are disjoint per process within an epoch position
    i0 = loaders[0]._epoch_indices(0)
    i1 = loaders[1]._epoch_indices(0)
    assert i0.shape[1] == 2 and i1.shape[1] == 2  # per-host batch = 4/2
    assert loaders[0].steps_per_epoch() == 6 * 10 // 2 // 2

    it = iter(loaders[0])
    batch = next(it)
    assert batch["GT"].shape == (2, 16, 16, 3)
    assert isinstance(batch["GT_path"], list) and len(batch["GT_path"]) == 2
    batch2 = next(it)
    assert batch2["GT"].shape == (2, 16, 16, 3)


def test_eval_loader(img_root):
    ds = create_dataset(_lqgt_opt(img_root, phase="val", GT_size=None, LR_size=None))
    loader = EvalLoader(ds)
    batches = list(loader)
    assert len(batches) == 6
    assert batches[0]["GT"].shape == (1, 40, 48, 3)
