#!/usr/bin/env python
"""Inference driver (denoising / stereo-sr parity entry point).

Parity: ref ``config/denoising-sde/inference.py:69-111`` (GT + synthetic
noise -> reverse-ODE from the optimal timestep) and
``config/stereo-sr/inference.py``.  Both flows are covered by the unified
evaluation driver — this wrapper keeps the reference CLI name alive.

Usage: python tools/inference.py -opt=<yml>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test import main  # noqa: E402  (tools/test.py)

if __name__ == "__main__":
    main()
