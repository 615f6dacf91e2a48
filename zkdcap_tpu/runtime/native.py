"""ctypes bindings for the native (C++) runtime kernels in native/.

pybind11 is not in this image, so bindings go through the C ABI + ctypes
(the supported path per the build environment). The library is compiled on
demand with the in-image g++; every native kernel has a pure-python
fallback so the stack works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblayout.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.permutation_mapping.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.permutation_mapping.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def permutation_mapping_native(m: int, n: int, copies: np.ndarray) -> np.ndarray | None:
    """copies: int64[n_copies, 4] -> int32[m, n, 2] or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    copies = np.ascontiguousarray(copies, dtype=np.int64)
    out = np.empty((m, n, 2), dtype=np.int32)
    lib.permutation_mapping(
        m,
        n,
        copies.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        copies.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
