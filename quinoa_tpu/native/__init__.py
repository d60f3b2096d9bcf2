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
    L.qn_hilbert_codes.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    L.qn_morton_codes.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    L.qn_tet_geometry.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_unique_edges.restype = ctypes.c_int64
    L.qn_unique_edges.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    L.qn_coords_cache.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_nodal_volumes.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_build_fose.restype = ctypes.c_int64
    L.qn_build_fose.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_build_fose_masked.restype = ctypes.c_int64
    L.qn_build_fose_masked.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_face_xi.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    L.qn_lz78_phrases.restype = ctypes.c_int64
    L.qn_lz78_phrases.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    L.qn_berlekamp_massey.restype = ctypes.c_int64
    L.qn_berlekamp_massey.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
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


def tet_geometry(coords: np.ndarray, inpoel: np.ndarray):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(coords, dtype=np.float64)
    inp = np.ascontiguousarray(inpoel, dtype=np.int32)
    E = inp.shape[0]
    J = np.empty(E, dtype=np.float64)
    grad = np.empty((E, 4, 3), dtype=np.float64)
    L.qn_tet_geometry(E, c, inp, J, grad.reshape(-1))
    return J, grad


def unique_edges(inpoel: np.ndarray) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    inp = np.ascontiguousarray(inpoel, dtype=np.int32)
    E = inp.shape[0]
    out = np.empty((E * 6, 2), dtype=np.int32)
    m = int(L.qn_unique_edges(E, inp, out.reshape(-1)))
    return out[:m].copy()


def coords_cache(coords: np.ndarray, inpoel: np.ndarray):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(coords, dtype=np.float64)
    inp = np.ascontiguousarray(inpoel, dtype=np.int32)
    E = inp.shape[0]
    cn = np.empty((4, 3, E), dtype=np.float64)
    ctr = np.empty((3, E), dtype=np.float64)
    L.qn_coords_cache(E, c, inp, cn.reshape(-1), ctr.reshape(-1))
    return cn, ctr


def nodal_volumes(J: np.ndarray, inpoel: np.ndarray, nnode: int):
    L = lib()
    if L is None:
        return None
    j = np.ascontiguousarray(J, dtype=np.float64)
    inp = np.ascontiguousarray(inpoel, dtype=np.int32)
    vol = np.empty(nnode, dtype=np.float64)
    L.qn_nodal_volumes(inp.shape[0], nnode, j, inp, vol)
    return vol


def build_fose(el: np.ndarray, er: np.ndarray, nelem: int):
    L = lib()
    if L is None:
        return None
    e1 = np.ascontiguousarray(el, dtype=np.int64)
    e2 = np.ascontiguousarray(er, dtype=np.int64)
    fose = np.empty((4, nelem), dtype=np.int32)
    fsideR = np.empty((4, nelem), dtype=np.float64)
    bad = int(L.qn_build_fose(len(e1), nelem, e1, e2,
                              fose.reshape(-1), fsideR.reshape(-1)))
    if bad:
        raise AssertionError(
            f"{bad} tets do not own exactly 4 face slots (malformed "
            "mesh or face table)")
    return fose, fsideR


def build_fose_masked(el, er, bctype, nelem: int, nown: int,
                      fose: np.ndarray, fsideR: np.ndarray) -> Optional[int]:
    """Fill the caller's pre-initialized (4, nelem) fose/fsideR slice in
    place; returns the count of owned elements without exactly 4 slots
    (None when the native library is unavailable)."""
    L = lib()
    if L is None:
        return None
    e1 = np.ascontiguousarray(el, dtype=np.int64)
    e2 = np.ascontiguousarray(er, dtype=np.int64)
    bt = np.ascontiguousarray(bctype, dtype=np.int32)
    assert fose.flags.c_contiguous and fsideR.flags.c_contiguous
    return int(L.qn_build_fose_masked(len(e1), nelem, nown, e1, e2, bt,
                                      fose.reshape(-1),
                                      fsideR.reshape(-1)))


def face_xi(coords, inpofa, shp, jacInv, n0, el, er):
    L = lib()
    if L is None:
        return None
    c = np.ascontiguousarray(coords, dtype=np.float64)
    fa = np.ascontiguousarray(inpofa, dtype=np.int32)
    s = np.ascontiguousarray(shp, dtype=np.float64)
    Ji = np.ascontiguousarray(jacInv, dtype=np.float64)
    a0 = np.ascontiguousarray(n0, dtype=np.float64)
    e1 = np.ascontiguousarray(el, dtype=np.int64)
    e2 = np.ascontiguousarray(er, dtype=np.int64)
    F, G = fa.shape[0], s.shape[0]
    xi_l = np.empty((F, G, 3), dtype=np.float64)
    xi_r = np.empty((F, G, 3), dtype=np.float64)
    L.qn_face_xi(F, G, c, fa, s, Ji.reshape(-1), a0, e1, e2,
                 xi_l.reshape(-1), xi_r.reshape(-1))
    return xi_l, xi_r


def hilbert_codes(pts: np.ndarray, bits: int = 16) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.empty(p.shape[0], dtype=np.uint64)
    L.qn_hilbert_codes(p.shape[0], p, bits, out)
    return out


def lz78_phrases(bits_packed: np.ndarray, nbits: int) -> Optional[int]:
    """LZ78 phrase count over a bit stream packed MSB-first in bytes
    (np.packbits layout); None when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    b = np.ascontiguousarray(bits_packed, dtype=np.uint8)
    assert b.size * 8 >= nbits
    return int(L.qn_lz78_phrases(b, nbits))


def berlekamp_massey(bits_packed: np.ndarray, nbits: int):
    """Linear complexity profile of a bit stream packed MSB-first in
    bytes: returns (jump_sizes int32 array, final complexity L), or
    None when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    b = np.ascontiguousarray(bits_packed, dtype=np.uint8)
    assert b.size * 8 >= nbits
    cap = nbits // 2 + 2
    jumps = np.empty(cap, dtype=np.int32)
    fl = ctypes.c_int64(0)
    nj = int(L.qn_berlekamp_massey(b, nbits, jumps, cap, ctypes.byref(fl)))
    return jumps[:nj].copy(), int(fl.value)


def morton_codes(pts: np.ndarray) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    p = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.empty(p.shape[0], dtype=np.uint64)
    L.qn_morton_codes(p.shape[0], p, out)
    return out
