"""Tetrahedral element geometry (host-side, float64 NumPy).

Precomputes the per-element quantities the reference recomputes inside every
element loop (Jacobian ``J = (B-A)x(C-A).(D-A)`` and linear shape-function
gradients via ``tk::crossdiv``, cf. src/PDE/CompFlow/CGCompFlow.hpp:191-348 and
src/Base/Vector.hpp:21-37).  On TPU these are constants of the (re)partitioned
mesh: computing them once in f64 on host and shipping them as dense [E,...]
tables removes redundant flops and keeps the hot kernels bandwidth-bound only
on solution data.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def tet_geometry(coords: np.ndarray, inpoel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Element Jacobians and shape-function gradients.

    Returns
    -------
    J : (nelem,) float64
        6x element volume; must be positive for a valid mesh.
    grad : (nelem, 4, 3) float64
        Gradients of the four linear (P1) shape functions:
        grad[e,a] = dN_a/d(x,y,z), constant per element.
        grad[e,1] = (ca x da)/J, grad[e,2] = (da x ba)/J,
        grad[e,3] = (ba x ca)/J, grad[e,0] = -sum(others).
    """
    A = coords[inpoel[:, 0]]
    ba = coords[inpoel[:, 1]] - A
    ca = coords[inpoel[:, 2]] - A
    da = coords[inpoel[:, 3]] - A
    J = np.einsum("ij,ij->i", np.cross(ba, ca), da)

    g1 = np.cross(ca, da) / J[:, None]
    g2 = np.cross(da, ba) / J[:, None]
    g3 = np.cross(ba, ca) / J[:, None]
    g0 = -(g1 + g2 + g3)
    grad = np.stack([g0, g1, g2, g3], axis=1)
    return J, grad


def nodal_volumes(coords: np.ndarray, inpoel: np.ndarray, nnode: int) -> np.ndarray:
    """Volume associated to each node: quarter of surrounding element volumes.

    Reference: Discretization::vol (src/Inciter/Discretization.cpp), where the
    nodal volume v_p = sum_e J_e/24 over elements containing p.
    """
    J, _ = tet_geometry(coords, inpoel)
    contrib = np.repeat(J / 24.0, 4)
    return np.bincount(inpoel.ravel(), weights=contrib, minlength=nnode)


def node_gradients(
    coords: np.ndarray,
    inpoel: np.ndarray,
    vol: np.ndarray,
    U: np.ndarray,
) -> np.ndarray:
    """Dual-volume-weighted nodal gradients of nodal fields.

    Counterpart of ``tk::nodegrad`` (src/Mesh/Gradients.hpp:31-46): the
    gradient at node p is the volume average over elements around p of the
    (constant) element gradient of the P1 interpolant.

    Parameters
    ----------
    U : (nnode, ncomp)
    Returns (nnode, ncomp, 3).
    """
    nnode = coords.shape[0]
    J, grad = tet_geometry(coords, inpoel)
    ue = U[inpoel]  # (E,4,C)
    # element gradient of each component: sum_a u_a grad_a  -> (E,C,3)
    egrad = np.einsum("eac,ead->ecd", ue, grad)
    w = (J / 24.0)[:, None, None] * egrad  # quarter-volume weight
    out = np.zeros((nnode,) + w.shape[1:])
    np.add.at(out, inpoel[:, 0], w)
    np.add.at(out, inpoel[:, 1], w)
    np.add.at(out, inpoel[:, 2], w)
    np.add.at(out, inpoel[:, 3], w)
    return out / vol[:, None, None]
