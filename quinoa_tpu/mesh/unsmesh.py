"""Unstructured tetrahedral mesh container.

Counterpart of the reference's ``tk::UnsMesh`` (src/Mesh/UnsMesh.hpp:50-119),
re-designed as a NumPy struct-of-arrays host container.  Device kernels never
see this class — they consume padded dense arrays derived from it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class UnsMesh:
    """3-D unstructured tetrahedral mesh (host side, NumPy).

    Attributes
    ----------
    coords : (nnode, 3) float64
        Node coordinates.
    inpoel : (nelem, 4) int32
        Tetrahedron connectivity (zero-based node ids).
    bface : dict sideset-id -> (nbf, 3) int32
        Boundary triangle connectivity per side set (like the reference's
        ``bface``/``triinpoel`` pair, src/IO/MeshReader.hpp:39-69).
    bnode : dict sideset-id -> (nbn,) int32
        Boundary node ids per side set.
    """

    coords: np.ndarray
    inpoel: np.ndarray
    bface: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    bnode: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)

    def __post_init__(self) -> None:
        self.coords = np.ascontiguousarray(self.coords, dtype=np.float64)
        self.inpoel = np.ascontiguousarray(self.inpoel, dtype=np.int32)
        if self.coords.ndim != 2 or self.coords.shape[1] != 3:
            raise ValueError(f"coords must be (nnode,3), got {self.coords.shape}")
        if self.inpoel.ndim != 2 or self.inpoel.shape[1] != 4:
            raise ValueError(f"inpoel must be (nelem,4), got {self.inpoel.shape}")

    @property
    def nnode(self) -> int:
        return self.coords.shape[0]

    @property
    def nelem(self) -> int:
        return self.inpoel.shape[0]

    def bnode_from_bface(self) -> Dict[int, np.ndarray]:
        """Derive per-sideset unique node lists from boundary triangles."""
        return {
            ss: np.unique(tris.ravel()).astype(np.int32)
            for ss, tris in self.bface.items()
        }

    def all_bnodes(self) -> np.ndarray:
        """Unique node ids over all side sets."""
        if not self.bnode and self.bface:
            self.bnode = self.bnode_from_bface()
        if not self.bnode:
            return np.zeros(0, dtype=np.int32)
        return np.unique(np.concatenate([v for v in self.bnode.values()]))

    def positive_jacobians(self) -> bool:
        """True if all element Jacobians (6*volume) are positive."""
        x = self.coords
        a, b, c, d = (x[self.inpoel[:, i]] for i in range(4))
        j = np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a)
        return bool((j > 0).all())
