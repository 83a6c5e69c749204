"""LMDB data-path coverage: pure-Python MDB writer/reader round-trip and
the ``data_type: lmdb`` dataset branch vs the image-folder branch.

Round-2 gap: the lmdb readers existed but nothing ever built or read an
LMDB.  The ``lmdb`` C package is absent in this image, so these tests run
entirely through image_restoration_sde_tpu/data/mdb.py — which also proves
the fallback works where the package is missing.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

from image_restoration_sde_tpu.data import datasets  # noqa: E402
from image_restoration_sde_tpu.data.mdb import MdbEnv, write_items  # noqa: E402


def test_mdb_roundtrip_inline_overflow_and_depth(tmp_path):
    rs = np.random.RandomState(0)
    items = {}
    for i in range(300):
        key = f"k{i:04d}".encode()
        # mix: tiny inline values, values crossing the overflow threshold,
        # and multi-page overflow chains
        size = int(rs.choice([10, 100, 1500, 5000, 9000]))
        items[key] = rs.bytes(size)
    out = tmp_path / "t.lmdb"
    write_items(str(out), sorted(items.items()))

    env = MdbEnv(str(out))
    st = env.stat()
    assert st["entries"] == 300
    assert st["depth"] >= 2, st  # multiple leaves -> at least one branch level
    assert st["overflow_pages"] > 0
    with env.begin(write=False) as txn:
        for k, v in items.items():
            got = txn.get(k)
            assert got == v, k
        assert txn.get(b"missing") is None
    env.close()


def test_mdb_single_small_entry(tmp_path):
    out = tmp_path / "one.lmdb"
    write_items(str(out), [(b"a", b"hello")])
    env = MdbEnv(str(out))
    assert env.stat()["depth"] == 1
    with env.begin() as txn:
        assert txn.get(b"a") == b"hello"
    env.close()


@pytest.fixture()
def png_pair(tmp_path):
    from PIL import Image

    rs = np.random.RandomState(3)
    for sub in ("GT", "LQ"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(4):
        h, w = 40 + 8 * i, 56
        gt = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        lq = np.clip(gt.astype(int) + 25, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(tmp_path / "GT" / f"im{i}.png")
        Image.fromarray(lq).save(tmp_path / "LQ" / f"im{i}.png")
    return tmp_path


def test_lmdb_dataset_matches_image_folder(png_pair, tmp_path):
    import create_lmdb

    n = create_lmdb.build_lmdb(str(png_pair / "GT"), str(tmp_path / "GT.lmdb"))
    assert n == 4
    create_lmdb.build_lmdb(str(png_pair / "LQ"), str(tmp_path / "LQ.lmdb"))

    common = {"mode": "LQGT", "phase": "val", "scale": 1}
    ds_img = datasets.LQGTDataset({**common, "data_type": "img",
                                   "dataroot_GT": str(png_pair / "GT"),
                                   "dataroot_LQ": str(png_pair / "LQ")})
    ds_lmdb = datasets.LQGTDataset({**common, "data_type": "lmdb",
                                    "dataroot_GT": str(tmp_path / "GT.lmdb"),
                                    "dataroot_LQ": str(tmp_path / "LQ.lmdb")})
    assert len(ds_img) == len(ds_lmdb) == 4
    for i in range(4):
        a, b = ds_img[i], ds_lmdb[i]
        # bit-for-bit: raw BGR blobs round-trip through uint8 exactly
        np.testing.assert_array_equal(a["GT"], b["GT"])
        np.testing.assert_array_equal(a["LQ"], b["LQ"])


def test_create_lmdb_cli(png_pair, tmp_path, capsys):
    import create_lmdb

    rc = create_lmdb.main(["--input", str(png_pair / "GT"),
                           "--output", str(tmp_path / "cli.lmdb")])
    assert rc == 0
    assert "wrote 4 images" in capsys.readouterr().out
    assert os.path.exists(tmp_path / "cli.lmdb" / "meta_info.pkl")
    assert os.path.exists(tmp_path / "cli.lmdb" / "data.mdb")
