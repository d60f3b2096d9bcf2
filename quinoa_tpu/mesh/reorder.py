"""Mesh reordering for memory locality.

Counterpart of the reference's Sorter/Reorder machinery (src/Inciter/
Sorter.cpp distributed PE-locality renumbering; src/Base/Reorder.cpp
remap/shiftToZero): on TPU the goal shifts from PE ownership to *gather
locality* — nodes and elements are renumbered along a Morton space-
filling curve so that the assembly tables index nearly-contiguous lanes
(SURVEY.md §7 'Sorter's job becomes an offline SFC sort').
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .unsmesh import UnsMesh
from ..parallel.partition import _morton_codes, element_centroids


def remap(ids: np.ndarray, newid: np.ndarray) -> np.ndarray:
    """Apply a node renumbering to a connectivity array (tk::remap)."""
    return newid[ids]


def shift_to_zero(inpoel: np.ndarray) -> Tuple[np.ndarray, int]:
    """Shift node ids so the smallest is zero (tk::shiftToZero)."""
    lo = int(inpoel.min())
    return inpoel - lo, lo


def hilbert_codes(pts: np.ndarray, bits: int = 16) -> np.ndarray:
    """Hilbert-curve index of 3-D points (Skilling's transpose
    algorithm, vectorized).

    Unlike Morton, the Hilbert curve has no octant-boundary jumps, so
    face-neighbor elements stay close in rank almost everywhere
    (measured on a 48^3 tet box: 95% of neighbor pairs within 2048
    ranks vs 84% for Morton) — the element ordering behind the fused
    Pallas face windows (the Sorter/Reorder locality analog,
    src/Inciter/Sorter.cpp)."""
    from ..native import hilbert_codes as _native_hc
    nat = _native_hc(pts, bits)
    if nat is not None:  # identical codes, one C++ pass
        return nat
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    span[span == 0] = 1.0
    X = ((pts - lo) / span * ((1 << bits) - 1)).astype(np.uint32).copy()
    n = 3
    M = np.uint32(1 << (bits - 1))
    # inverse undo excess work
    Q = M
    while Q > 1:
        P = np.uint32(Q - 1)
        for i in range(n):
            cond = (X[:, i] & Q) != 0
            X[cond, 0] ^= P
            t = (X[:, 0] ^ X[:, i]) & P
            t = np.where(cond, np.uint32(0), t)
            X[:, 0] ^= t
            X[:, i] ^= t
        Q >>= np.uint32(1)
    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros_like(X[:, 0])
    Q = M
    while Q > 1:
        cond = (X[:, n - 1] & Q) != 0
        t = np.where(cond, t ^ np.uint32(Q - 1), t)
        Q >>= np.uint32(1)
    for i in range(n):
        X[:, i] ^= t
    # interleave the transpose-format bits (X[0] carries the MSB)
    h = np.zeros(len(X), dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << np.uint64(1)) | (
                (X[:, i] >> np.uint32(b)) & 1
            ).astype(np.uint64)
    return h


def hilbert_element_reorder(mesh: UnsMesh) -> Tuple[UnsMesh, np.ndarray]:
    """Renumber ELEMENTS along the Hilbert curve (nodes untouched).

    Returns (new mesh, eorder) with eorder new->old: new.inpoel[i] =
    mesh.inpoel[eorder[i]].  Element fields on the old mesh map to the
    new one as u_new = u_old[..., eorder]."""
    ecode = hilbert_codes(element_centroids(mesh.coords, mesh.inpoel))
    eorder = np.argsort(ecode, kind="stable")
    out = UnsMesh(coords=mesh.coords, inpoel=mesh.inpoel[eorder])
    out.bface = dict(mesh.bface)
    out.bnode = mesh.bnode
    return out, eorder


def first_touch_node_reorder(mesh: UnsMesh) -> Tuple[UnsMesh, np.ndarray]:
    """Renumber NODES by first appearance in element order (elements
    untouched).

    With Hilbert-ordered elements this makes each element's node ids
    concentrate around a sliding frontier — the locality contract
    behind the CG window kernels (ops/node_window.py); the reference's
    equivalent is Sorter's start-vector node reordering
    (src/Inciter/Sorter.cpp:272-317, "reorder node ids by the order
    they first appear in the connectivity").

    Returns (new mesh, nperm) with nperm old->new: new id of old node
    i is nperm[i]; nodal fields map as u_new[:, nperm] = u_old.
    """
    flat = mesh.inpoel.reshape(-1)
    first = np.full(mesh.nnode, -1, np.int64)
    # np.unique returns each node's FIRST flat index; ranking those
    # indices reproduces the sequential first-appearance scan without
    # the Python loop (O(n log n) vectorized vs ~seconds at 2.6M ids).
    uniq, fidx = np.unique(flat, return_index=True)
    order = np.argsort(fidx, kind="stable")
    first[uniq[order]] = np.arange(len(uniq))
    nxt = len(uniq)
    # isolated nodes (no element) keep stable order at the end
    rest = np.nonzero(first < 0)[0]
    first[rest] = nxt + np.arange(len(rest))
    nperm = first
    coords = np.empty_like(mesh.coords)
    coords[nperm] = mesh.coords
    out = UnsMesh(coords=coords, inpoel=nperm[mesh.inpoel])
    # bface triangles carry NODE ids (unsmesh.py:26) — renumber both
    out.bface = {k: nperm[np.asarray(v)] for k, v in mesh.bface.items()}
    out.bnode = {k: nperm[np.asarray(v)] for k, v in mesh.bnode.items()}
    return out, nperm


def sfc_reorder(mesh: UnsMesh) -> Tuple[UnsMesh, np.ndarray, np.ndarray]:
    """Renumber nodes and elements along the Morton curve.

    Returns (new mesh, node_perm, elem_perm) where node_perm[old] = new
    and elem_perm[old] = new — use them to remap fields.
    """
    ncode = _morton_codes(mesh.coords)
    norder = np.argsort(ncode, kind="stable")  # new -> old
    node_perm = np.empty(mesh.nnode, dtype=np.int64)
    node_perm[norder] = np.arange(mesh.nnode)  # old -> new

    ecode = _morton_codes(element_centroids(mesh.coords, mesh.inpoel))
    eorder = np.argsort(ecode, kind="stable")
    elem_perm = np.empty(mesh.nelem, dtype=np.int64)
    elem_perm[eorder] = np.arange(mesh.nelem)

    out = UnsMesh(
        coords=mesh.coords[norder],
        inpoel=node_perm[mesh.inpoel[eorder]].astype(np.int32),
    )
    out.bface = {
        ss: node_perm[tris].astype(np.int32) for ss, tris in mesh.bface.items()
    }
    out.bnode = out.bnode_from_bface()
    return out, node_perm, elem_perm
