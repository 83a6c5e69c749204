"""End-to-end test of the quality-parity harness (tools/eval_parity.py).

Fabricates a torch-random reference ConditionalUNet checkpoint (built from
the live /root/reference sources via tools/transplant_check), a tiny paired
dataset, and runs the harness both ways: with a reachable PSNR target it
exits 0 and with the real Rain100H target (unreachable for a random net) it
exits 1.  Proves the one-command path works whenever real assets exist.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

import transplant_check as tc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(tc.REFERENCE, "codes")),
    reason="reference sources not available",
)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from PIL import Image

    root = tmp_path_factory.mktemp("parity")
    setting = {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}
    net = tc.build_torch_net("ConditionalUNet", setting)
    # fully randomized (zero-init tails would mask import bugs)
    sd = net.state_dict()
    g = torch.Generator().manual_seed(0)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    pth = root / "random_G.pth"
    torch.save(sd, pth)

    rs = np.random.RandomState(1)
    for sub in ("GT", "LQ"):
        os.makedirs(root / "data" / sub, exist_ok=True)
    for i in range(2):
        gt = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        lq = np.clip(gt.astype(int) + 20, 0, 255).astype(np.uint8)
        Image.fromarray(gt).save(root / "data" / "GT" / f"im{i}.png")
        Image.fromarray(lq).save(root / "data" / "LQ" / f"im{i}.png")
    return root, setting, str(pth)


def _run(root, setting, pth, extra):
    import json

    import eval_parity

    argv = [
        "--data", str(root / "data"), "--pth", pth,
        "--setting", json.dumps(setting), "--T", "4", "--dtype", "f32",
        "--save-dir", str(root / "out"),
    ] + extra
    return eval_parity.main(argv)


def test_harness_passes_reachable_target(assets, capsys):
    root, setting, pth = assets
    rc = _run(root, setting, pth, ["--target-psnr", "3.0"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS" in out and "parity vs reference" in out
    # restored images were written
    assert sorted(os.listdir(root / "out")) == ["im0.png", "im1.png"]
    # per-image metrics are finite and self-consistent with the average
    psnrs = [float(l.split("PSNR")[1].split()[0]) for l in out.splitlines()
             if l.strip().startswith(("1 ", "2 "))]
    avg_line = [l for l in out.splitlines() if l.startswith("PSNR ")][0]
    assert np.isclose(float(avg_line.split()[1]), np.mean(psnrs), atol=5e-4)


def test_harness_fails_reference_target(assets, capsys):
    root, setting, pth = assets
    # a torch-random net cannot reach 31.65 dB: the gate must trip
    rc = _run(root, setting, pth, [])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL" in out


def test_harness_reports_lpips_with_pth(assets, capsys, tmp_path):
    """--lpips-pth drives the in-repo JAX LPIPS (utils/lpips.py): the LPIPS
    column must carry a real number, matching the reference's metric surface
    (ref test.py:74,149-150)."""
    torch = pytest.importorskip("torch")
    from test_lpips import _random_state_dict

    root, setting, pth = assets
    lpips_pth = tmp_path / "lpips_alex.pth"
    torch.save(_random_state_dict(), str(lpips_pth))
    rc = _run(root, setting, pth,
              ["--target-psnr", "3.0", "--lpips-pth", str(lpips_pth)])
    out = capsys.readouterr().out
    assert rc == 0, out
    lpips_line = [l for l in out.splitlines() if l.startswith("LPIPS")][0]
    val = lpips_line.split()[1]
    assert val != "n/a" and float(val) >= 0.0


def test_harness_reports_fid_with_pth(assets, capsys, tmp_path):
    """--fid-pth drives the in-repo JAX FID (utils/fid.py): the FID row must
    carry a real number — the harness then prints all four published
    Rain100H metrics column-for-column (ref README.md:46)."""
    from test_fid import _random_state_dict

    root, setting, pth = assets
    fid_npz = tmp_path / "fid_inception.npz"
    np.savez(str(fid_npz),
             **{k: v.numpy() for k, v in _random_state_dict().items()})
    rc = _run(root, setting, pth,
              ["--target-psnr", "3.0", "--fid-pth", str(fid_npz)])
    out = capsys.readouterr().out
    assert rc == 0, out
    fid_line = [l for l in out.splitlines() if l.startswith("FID")][0]
    val = fid_line.split()[1]
    assert val != "n/a" and np.isfinite(float(val))
