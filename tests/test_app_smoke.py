"""Import-mocked smoke for the gradio demo (tools/app.py).

The ``gradio`` package is absent in this image, so a stub module captures
the Interface construction; the test then drives the captured ``restore``
callback with a real image and checks a restored uint8 image comes back —
proving the app path (YAML -> task -> infer -> tensor2img) constructs and
runs.  Ref: config/deraining/app.py:27-38.
"""

import os
import sys
import types

import numpy as np
import yaml

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_app_constructs_and_restores(tmp_path, monkeypatch):
    cfg = {
        "name": "app-smoke", "suffix": None, "model": "denoising",
        "distortion": "derain", "gpu_ids": [0],
        "sde": {"max_sigma": 10, "T": 3, "schedule": "cosine", "eps": 0.005,
                "sampling_mode": "sde"},
        "degradation": {"sigma": 25, "noise_type": "G", "scale": 4},
        "datasets": {},
        "network_G": {"which_model_G": "ConditionalUNet",
                      "setting": {"in_nc": 3, "out_nc": 3, "nf": 8, "depth": 2}},
        "path": {"root": str(tmp_path)},
    }
    opt_path = tmp_path / "app.yml"
    yaml.safe_dump(cfg, open(opt_path, "w"))

    captured = {}

    class _Image:
        def __init__(self, **kw):
            pass

    class _Interface:
        def __init__(self, fn=None, **kw):
            captured["fn"] = fn
            captured["kw"] = kw

        def launch(self, **kw):
            captured["launched"] = kw

    stub = types.ModuleType("gradio")
    stub.Interface = _Interface
    stub.Image = _Image
    monkeypatch.setitem(sys.modules, "gradio", stub)

    import app

    app.main([f"-opt={opt_path}", "--port", "7999"])
    assert captured["launched"] == {"server_port": 7999}
    assert "app-smoke" in captured["kw"]["title"]

    rs = np.random.RandomState(0)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    out = captured["fn"](img)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
