"""Transplant-parity regression: the torch->flax importer reproduces the
reference nets' outputs numerically (PARITY.md's 2.3e-7 claim, now a test).

For each architecture: build the reference torch module from /root/reference
sources with fully randomized weights (so zero-init branches can't mask
mismatches), import the state_dict through utils/torch_import, and compare
outputs on the same input.  Skipped when the reference tree is absent.
"""

import os
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

import transplant_check as tc  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(tc.REFERENCE, "codes")),
    reason="reference sources not available",
)


@pytest.mark.parametrize("arch", sorted(tc.TASK_DIR))
def test_transplant_parity(arch):
    pytest.importorskip("torch")
    delta = tc.compare(arch, tc.DEFAULT_SETTINGS[arch], pth=None, size=32, batch=1)
    assert delta < 5e-6, f"{arch}: transplant max|delta|={delta}"
