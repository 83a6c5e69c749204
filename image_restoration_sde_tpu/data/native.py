"""ctypes bridge to the native C++ resampler (native/resize.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp, cached under the
package build dir) and exposes :func:`resize_cubic_native`.  Falls back
silently to the numpy implementation when no compiler is available —
``imresize``/``torch_bicubic_resize`` pick the native path automatically.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "resize.cpp")
_BUILD_DIR = os.environ.get(
    "IRSDE_NATIVE_BUILD_DIR", os.path.join(os.path.dirname(__file__), "_native_build")
)


def _build() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(_BUILD_DIR, "libirsde_resize.so")
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            src, "-o", so_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    lib = ctypes.CDLL(so_path)
    lib.resize_cubic_f32.restype = ctypes.c_int
    lib.resize_cubic_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _FAILED:
            _LIB = _build()
            if _LIB is None:
                _FAILED = True
    return _LIB


def resize_cubic_native(
    img: np.ndarray, out_hw, scales, a: float, antialias: bool, boundary: str
) -> Optional[np.ndarray]:
    """HWC float32 resize via the native library; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    H, W, C = img.shape
    OH, OW = out_hw
    dst = np.empty((OH, OW, C), dtype=np.float32)
    rc = lib.resize_cubic_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, C,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), OH, OW,
        ctypes.c_double(scales[0]), ctypes.c_double(scales[1]),
        ctypes.c_double(a), 1 if antialias else 0,
        0 if boundary == "symmetric" else 1,
    )
    if rc != 0:
        return None
    return dst
