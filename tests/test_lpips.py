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


def _random_vgg_state_dict(seed=0):
    """Random weights under the exact lpips.LPIPS(net='vgg') key naming."""
    g = torch.Generator().manual_seed(seed)
    sd = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    in_ch = 3
    for k, s, p, out_ch, key, pool in jlpips._VGG_CONVS:
        sd[key + ".weight"] = torch.randn(out_ch, in_ch, k, k, generator=g) * 0.05
        sd[key + ".bias"] = torch.randn(out_ch, generator=g) * 0.05
        in_ch = out_ch
    for i, tap in enumerate(jlpips._SPECS["vgg"]["taps"]):
        out_ch = jlpips._VGG_CONVS[tap][3]
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, out_ch, 1, 1, generator=g) * 0.1
    return sd


def _torch_lpips_vgg(sd, a, b):
    """Straight-line torch forward of LPIPS v0.1 vgg (oracle)."""
    taps_at = set(jlpips._SPECS["vgg"]["taps"])

    def feats(x):
        h = (x - sd["scaling_layer.shift"]) / sd["scaling_layer.scale"]
        taps = []
        for i, (k, s, p, _, key, pool) in enumerate(jlpips._VGG_CONVS):
            if pool:
                h = F.max_pool2d(h, 2, 2)
            h = F.relu(F.conv2d(h, sd[key + ".weight"], sd[key + ".bias"],
                                stride=s, padding=p))
            if i in taps_at:
                norm = torch.sqrt((h ** 2).sum(dim=1, keepdim=True))
                taps.append(h / (norm + 1e-10))
        return taps

    total = 0.0
    for i, (f0, f1) in enumerate(zip(feats(a), feats(b))):
        lin = F.conv2d((f0 - f1) ** 2, sd[f"lin{i}.model.1.weight"])
        total = total + lin.mean(dim=(2, 3))
    return total.squeeze(1)


def test_lpips_vgg_matches_torch_oracle(tmp_path):
    sd = _random_vgg_state_dict()
    pth = tmp_path / "lpips_vgg.pth"
    torch.save(sd, str(pth))

    rng = np.random.RandomState(0)
    a = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    b = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1

    with torch.no_grad():
        want = _torch_lpips_vgg(sd, torch.from_numpy(a), torch.from_numpy(b)).numpy()

    params, net = jlpips.load_lpips(str(pth))
    assert net == "vgg"  # auto-detected from slice1.2
    got = np.asarray(jlpips.lpips_distance(
        params, np.moveaxis(a, 1, -1), np.moveaxis(b, 1, -1), net=net))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_perceptual_loss_fn_is_differentiable(tmp_path):
    """The in-graph PerceptualMatchingLoss term: grads flow to the predict
    image through the frozen vgg backbone (ref loss.py:34-58 trains with
    lpips(net='vgg') exactly this way)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_sde_tpu.training.losses import perceptual_matching_loss

    sd = _random_vgg_state_dict(2)
    pth = tmp_path / "lpips_vgg.pth"
    torch.save(sd, str(pth))
    lpips_fn = jlpips.make_perceptual_loss_fn(str(pth))

    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    tgt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))

    loss_fn = jax.jit(lambda p: perceptual_matching_loss(
        p, tgt, "l1", lpips_fn=lpips_fn))
    plain = perceptual_matching_loss(pred, tgt, "l1")
    loss, grad = jax.value_and_grad(loss_fn)(pred)
    assert float(loss) > float(plain)  # the lpips term adds a positive distance
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).max() > 0.0
