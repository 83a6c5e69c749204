"""LPIPS(alex) math parity: the JAX implementation vs a hand-rolled torch
forward of the SAME randomized weights (the lpips pip package is absent from
this image; the math is pinned instead — ref test.py:74,149-150 computes
LPIPS per image with lpips.LPIPS(net='alex'))."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from image_restoration_sde_tpu.utils import lpips as jlpips  # noqa: E402


def _random_state_dict(seed=0):
    """Random weights under the exact lpips.LPIPS(net='alex') key naming."""
    g = torch.Generator().manual_seed(seed)
    sd = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    in_ch = 3
    for k, s, p, out_ch, key, pool in jlpips._ALEX_CONVS:
        sd[key + ".weight"] = torch.randn(out_ch, in_ch, k, k, generator=g) * 0.05
        sd[key + ".bias"] = torch.randn(out_ch, generator=g) * 0.05
        in_ch = out_ch
    for i, (_, _, _, out_ch, _, _) in enumerate(jlpips._ALEX_CONVS):
        # real lpips lins are non-negative (learned through a ReLU param'n)
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, out_ch, 1, 1, generator=g) * 0.1
    return sd


def _torch_lpips(sd, a, b):
    """Straight-line torch forward of LPIPS v0.1 alex (oracle)."""

    def feats(x):
        h = (x - sd["scaling_layer.shift"]) / sd["scaling_layer.scale"]
        taps = []
        for k, s, p, _, key, pool in jlpips._ALEX_CONVS:
            if pool:
                h = F.max_pool2d(h, 3, 2)
            h = F.relu(F.conv2d(h, sd[key + ".weight"], sd[key + ".bias"],
                                stride=s, padding=p))
            norm = torch.sqrt((h ** 2).sum(dim=1, keepdim=True))
            taps.append(h / (norm + 1e-10))
        return taps

    total = 0.0
    for i, (f0, f1) in enumerate(zip(feats(a), feats(b))):
        lin = F.conv2d((f0 - f1) ** 2, sd[f"lin{i}.model.1.weight"])
        total = total + lin.mean(dim=(2, 3))
    return total.squeeze(1)


def test_lpips_matches_torch_oracle(tmp_path):
    sd = _random_state_dict()
    pth = tmp_path / "lpips_alex.pth"
    torch.save(sd, str(pth))

    rng = np.random.RandomState(0)
    a = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    b = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1

    with torch.no_grad():
        want = _torch_lpips(sd, torch.from_numpy(a), torch.from_numpy(b)).numpy()

    params = jlpips.load_lpips_params(str(pth))
    got = np.asarray(jlpips.lpips_alex(
        params, np.moveaxis(a, 1, -1), np.moveaxis(b, 1, -1)))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lpips_identity_is_zero(tmp_path):
    sd = _random_state_dict(1)
    pth = tmp_path / "lpips_alex.pth"
    torch.save(sd, str(pth))
    fn = jlpips.make_lpips_fn(str(pth))
    img = (np.random.RandomState(1).rand(40, 40, 3) * 255).astype(np.uint8)
    assert fn(img, img) == 0.0
    assert fn(img, 255 - img) > 0.0


def test_lpips_rejects_lin_only_checkpoint(tmp_path):
    # the official v0.1 alex.pth ships only lin heads — must fail loudly
    sd = {k: v for k, v in _random_state_dict().items() if k.startswith("lin")}
    pth = tmp_path / "lins_only.pth"
    torch.save(sd, str(pth))
    with pytest.raises(ValueError, match="backbone"):
        jlpips.load_lpips_params(str(pth))
