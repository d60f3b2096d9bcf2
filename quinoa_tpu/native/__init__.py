"""ctypes bindings for the native host kernels (native/quinoa_native.cpp).

Builds the shared library on first use (make, g++) and gracefully falls
back to the NumPy implementations when a toolchain is unavailable —
callers use `quinoa_tpu.native.lib()` and check for None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if necessary; None if
    unavailable (QUINOA_TPU_NO_NATIVE=1 disables)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("QUINOA_TPU_NO_NATIVE") == "1":
        return None
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libquinoa_native.so"))
    try:
        # Always invoke make: the Makefile's source->target dependency means
        # this is a fast no-op when the .so is current, and it guarantees
        # source edits are never silently ignored by a stale binary.
        subprocess.run(
            ["make", "-s"], cwd=os.path.dirname(so), check=True,
            capture_output=True,
        )
        L = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None

    L.qn_gen_esuel.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    L.qn_nsup_degree.restype = ctypes.c_int64
    L.qn_nsup_degree.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    L.qn_build_nsup.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    L.qn_morton_codes.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    _LIB = L
    return _LIB


def gen_esuel(inpoel: np.ndarray) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    inp = np.ascontiguousarray(inpoel, dtype=np.int32)
    out = np.empty((inp.shape[0], 4), dtype=np.int32)
    L.qn_gen_esuel(inp.shape[0], inp, out)
    return out


def build_nsup(incid: np.ndarray, nnode: int):
    L = lib()
    if L is None:
        return None
    inc = np.ascontiguousarray(incid, dtype=np.int32)
    E, A = inc.shape
    D = int(L.qn_nsup_degree(E, A, nnode, inc))
    out = np.empty((D, nnode), dtype=np.int32)
    L.qn_build_nsup(E, A, nnode, inc, D, out)
    return out, D


def morton_codes(pts: np.ndarray) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.empty(p.shape[0], dtype=np.uint64)
    L.qn_morton_codes(p.shape[0], p, out)
    return out
