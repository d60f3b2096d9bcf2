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
