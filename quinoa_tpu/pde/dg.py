"""Discontinuous-Galerkin core: geometry tables and integral operators.

TPU-native re-design of the reference's DG machinery (src/PDE/Integrate/
{Volume,Surface,Boundary,Mass,Source}.cpp and src/Inciter/DG.cpp): instead
of per-element/per-face loops that rebuild coordinates, Jacobians, and
basis values at every Gauss point, everything static is precomputed
host-side once per (re)partition:

- per-element: volume, Jacobian matrix (dx/dxi), its inverse, node-0 anchor;
- per-face: left/right elements, unit normal (outward from left), area, and
  the *reference coordinates* of every face Gauss point in the left and
  right element frames (so device-side basis evaluation is a few fused
  polynomial ops, not a coordinate solve);
- constant tables: volume-rule Gauss points/weights, Dubiner basis and its
  reference gradients at those points, diagonal mass entries.

The rhs is then three dense passes: a volume contraction, a face pass with
two scatter-adds (left/right), and the boundary treatment folded into the
same face pass via per-face BC-type masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.derived import gen_faces, gen_esuel, _TET_FACES
from ..ops.basis import eval_basis, eval_dbdxi, mass_diag
from ..ops.quadrature import gauss_tet, gauss_tri, ng_vol, ng_face, ng_init

# BC type codes (per boundary face)
BC_INTERIOR = 0
BC_DIRICHLET = 1
BC_SYMMETRY = 2
BC_EXTRAPOLATE = 3

# reference-tet vertices
_REF_NODES = np.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vol", "jacInv", "Jmat", "node0", "emask",
        "esuf", "fn", "farea", "xi_l", "xi_r", "bctype", "fmask",
        "esuel", "w_vol", "xi_vol", "B_vol", "dBdxi_vol", "mnorm",
        "w_face", "xi_selfface",
    ],
    meta_fields=["ndof", "nelem_real"],
)
@dataclasses.dataclass(frozen=True)
class DGGeom:
    """Static DG geometry tables (single shard; padded in the SPMD build).

    vol     : (E,)      element volumes (1.0 padding)
    jacInv  : (E,3,3)   d(xi)/dx
    Jmat    : (E,3,3)   dx/d(xi) (columns = edge vectors from node 0)
    node0   : (E,3)     coordinates of local node 0
    emask   : (E,)      1.0 real / 0.0 padding
    esuf    : (F,2) i32 left/right elements (right == left for boundary)
    fn      : (F,3)     unit face normal, outward from the left element
    farea   : (F,)      face area
    xi_l/r  : (F,G,3)   face Gauss points in left/right element ref coords
    bctype  : (F,) i32  BC code (interior 0)
    fmask   : (F,)      1.0 real face / 0.0 padding
    esuel   : (E,4) i32 face-neighbor elements (-1 = boundary) for limiters
    w_vol   : (Gv,)     volume-rule weights (sum 1)
    xi_vol  : (Gv,3)    volume-rule points
    B_vol   : (Gv,K)    basis at volume points
    dBdxi_vol:(Gv,K,3)  basis reference-gradients at volume points
    mnorm   : (K,)      normalized diagonal mass entries
    w_face  : (G,)      face-rule weights (sum 1)
    xi_selfface:(4,G,3) face Gauss points of the element's own 4 faces in
                        its own reference coords (constant; for limiters)
    """

    vol: jnp.ndarray
    jacInv: jnp.ndarray
    Jmat: jnp.ndarray
    node0: jnp.ndarray
    emask: jnp.ndarray
    esuf: jnp.ndarray
    fn: jnp.ndarray
    farea: jnp.ndarray
    xi_l: jnp.ndarray
    xi_r: jnp.ndarray
    bctype: jnp.ndarray
    fmask: jnp.ndarray
    esuel: jnp.ndarray
    w_vol: jnp.ndarray
    xi_vol: jnp.ndarray
    B_vol: jnp.ndarray
    dBdxi_vol: jnp.ndarray
    mnorm: jnp.ndarray
    w_face: jnp.ndarray
    xi_selfface: jnp.ndarray
    ndof: int
    nelem_real: int

    @property
    def nelem(self) -> int:
        return self.vol.shape[0]

    def phys_gp(self, elem_ids, xi):
        """Physical coords of ref points xi (F,G,3) in elements elem_ids."""
        X0 = self.node0[elem_ids]  # (F,3)
        Jm = self.Jmat[elem_ids]  # (F,3,3)
        return X0[:, None, :] + jnp.einsum("fij,fgj->fgi", Jm, xi)


def _self_face_gauss(ng: int) -> np.ndarray:
    """Ref coords of the ng face Gauss points on each of the 4 ref-tet faces."""
    pts, _ = gauss_tri(ng)
    shp = np.stack([1.0 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
    out = np.empty((4, ng, 3))
    for lf in range(4):
        tri = _REF_NODES[_TET_FACES[lf]]
        out[lf] = shp @ tri
    return out


def build_dggeom(
    mesh,
    ndof: int,
    bc_sidesets: Optional[Dict[int, int]] = None,
    dtype=None,
) -> DGGeom:
    """Build single-shard DG geometry from a host UnsMesh.

    bc_sidesets maps side-set id -> BC code (BC_DIRICHLET/SYMMETRY/
    EXTRAPOLATE); unlisted boundary faces default to extrapolate.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    coords, inpoel = mesh.coords, mesh.inpoel
    E = mesh.nelem

    # element geometry
    n0 = coords[inpoel[:, 0]]
    Jm = np.stack(
        [
            coords[inpoel[:, 1]] - n0,
            coords[inpoel[:, 2]] - n0,
            coords[inpoel[:, 3]] - n0,
        ],
        axis=2,
    )  # (E,3,3), columns are edges: dx/dxi
    detJ = np.linalg.det(Jm)
    if not (detJ > 0).all():
        raise ValueError("mesh has non-positive element Jacobians")
    vol = detJ / 6.0
    jacInv = np.linalg.inv(Jm)

    # faces
    fd = gen_faces(inpoel, mesh.nnode)
    esuf = fd["esuf"].copy()
    inpofa = fd["inpofa"]
    nbfac = fd["nbfac"]
    F = esuf.shape[0]

    a = coords[inpofa[:, 0]]
    b = coords[inpofa[:, 1]]
    c = coords[inpofa[:, 2]]
    nvec = np.cross(b - a, c - a)  # outward from left, |n| = 2*area
    farea = 0.5 * np.linalg.norm(nvec, axis=1)
    fn = nvec / (2.0 * farea[:, None])

    # face Gauss points: physical, then to L/R reference coords
    ngf = ng_face(ndof)
    tp, tw = gauss_tri(ngf)
    shp = np.stack([1.0 - tp[:, 0] - tp[:, 1], tp[:, 0], tp[:, 1]], axis=1)
    gp = np.einsum("gi,fid->fgd", shp, coords[inpofa])  # (F,G,3)

    el = esuf[:, 0]
    er = np.where(esuf[:, 1] < 0, el, esuf[:, 1])
    xi_l = np.einsum("fij,fgj->fgi", jacInv[el], gp - n0[el][:, None, :])
    xi_r = np.einsum("fij,fgj->fgi", jacInv[er], gp - n0[er][:, None, :])

    # boundary types by side set
    bctype = np.zeros(F, dtype=np.int32)
    bctype[:nbfac] = BC_EXTRAPOLATE
    if bc_sidesets:
        key2f = {}
        for i in range(nbfac):
            key2f[tuple(sorted(inpofa[i]))] = i
        for ss, code in bc_sidesets.items():
            for tri in mesh.bface.get(ss, ()):
                f = key2f.get(tuple(sorted(tri)))
                if f is not None:
                    bctype[f] = code

    # volume rule tables
    ngv = ng_vol(ndof)
    vp, vw = gauss_tet(ngv)
    B_vol = np.asarray(eval_basis(ndof, jnp.asarray(vp)))
    dBdxi_vol = np.asarray(eval_dbdxi(ndof, jnp.asarray(vp)))

    esuel = gen_esuel(inpoel, mesh.nnode)

    return DGGeom(
        vol=jnp.asarray(vol, dtype=dtype),
        jacInv=jnp.asarray(jacInv, dtype=dtype),
        Jmat=jnp.asarray(Jm, dtype=dtype),
        node0=jnp.asarray(n0, dtype=dtype),
        emask=jnp.ones(E, dtype=dtype),
        esuf=jnp.asarray(np.stack([el, er], axis=1), dtype=jnp.int32),
        fn=jnp.asarray(fn, dtype=dtype),
        farea=jnp.asarray(farea, dtype=dtype),
        xi_l=jnp.asarray(xi_l, dtype=dtype),
        xi_r=jnp.asarray(xi_r, dtype=dtype),
        bctype=jnp.asarray(bctype),
        fmask=jnp.ones(F, dtype=dtype),
        esuel=jnp.asarray(esuel),
        w_vol=jnp.asarray(vw, dtype=dtype),
        xi_vol=jnp.asarray(vp, dtype=dtype),
        B_vol=jnp.asarray(B_vol, dtype=dtype),
        dBdxi_vol=jnp.asarray(dBdxi_vol, dtype=dtype),
        mnorm=jnp.asarray(mass_diag(ndof), dtype=dtype),
        w_face=jnp.asarray(tw, dtype=dtype),
        xi_selfface=jnp.asarray(_self_face_gauss(ngf), dtype=dtype),
        ndof=int(ndof),
        nelem_real=int(E),
    )


# -- operators ---------------------------------------------------------------


def eval_state(U, B):
    """U (E,C,K), B (...,K) -> state (...,C) by dof contraction."""
    return jnp.einsum("eck,e...k->e...c", U, B)


def dg_rhs(system, geom: DGGeom, U, dofmask, t):
    """DG right-hand side: volume + surface + boundary + source integrals.

    U       : (E, C, K) modal solution
    dofmask : (E, K) 1.0 for active dofs (p-adaptivity), 0.0 otherwise
    Returns R : (E, C, K) (same layout as U).
    """
    E, C, K = U.shape
    Ue = U * dofmask[:, None, :]

    R = jnp.zeros_like(U)

    # ---- volume integral (K > 1 only) ------------------------------------
    if K > 1:
        state = jnp.einsum("eck,gk->egc", Ue, geom.B_vol)  # (E,G,C)
        gp = geom.node0[:, None, :] + jnp.einsum(
            "eij,gj->egi", geom.Jmat, geom.xi_vol
        )
        Fl = system.flux(state, gp, t)  # (E,G,C,3)
        s = system.src(gp.reshape(-1, 3), t).reshape(E, -1, C)
        # pull the flux back to reference space first so no intermediate
        # exceeds (E,G,C,3):  Fref[e,g,c,m] = F[e,g,c,j] jacInv[e,m,j]
        Fref = jnp.einsum("egcj,emj->egcm", Fl, geom.jacInv)
        contrib = jnp.einsum("g,egcm,gkm->eck", geom.w_vol, Fref, geom.dBdxi_vol)
        contrib = contrib + jnp.einsum("g,egc,gk->eck", geom.w_vol, s, geom.B_vol)
        R = R + (geom.vol * geom.emask)[:, None, None] * contrib
    else:
        gp = geom.node0[:, None, :] + jnp.einsum(
            "eij,gj->egi", geom.Jmat, geom.xi_vol
        )
        s = system.src(gp.reshape(-1, 3), t).reshape(E, -1, C)
        contrib = jnp.einsum("g,egc,gk->eck", geom.w_vol, s, geom.B_vol)
        R = R + (geom.vol * geom.emask)[:, None, None] * contrib

    # ---- surface integral (interior + boundary in one pass) --------------
    el = geom.esuf[:, 0]
    er = geom.esuf[:, 1]
    B_l = eval_basis(geom.ndof, geom.xi_l) * dofmask[el][:, None, :]
    B_r = eval_basis(geom.ndof, geom.xi_r) * dofmask[er][:, None, :]
    sL = jnp.einsum("fck,fgk->fgc", Ue[el], B_l)  # (F,G,C)
    sR = jnp.einsum("fck,fgk->fgc", Ue[er], B_r)

    gpf = geom.phys_gp(el, geom.xi_l)  # (F,G,3)
    fnb = geom.fn[:, None, :]  # (F,1,3) broadcast over G

    # boundary ghost states by BC type
    bt = geom.bctype[:, None, None]  # (F,1,1)
    sR = jnp.where(bt == BC_INTERIOR, sR, system.bc_state(geom.bctype, sL, fnb, gpf, t))

    fl = system.riemann(jnp.broadcast_to(fnb, sL.shape[:-1] + (3,)), sL, sR, gpf, t)

    wt = (geom.w_face[None, :] * geom.farea[:, None] * geom.fmask[:, None])
    contribL = -jnp.einsum("fg,fgc,fgk->fck", wt, fl, B_l)
    contribR = jnp.einsum("fg,fgc,fgk->fck", wt, fl, B_r)

    R = R.at[el].add(contribL)
    # do not scatter to the right element of boundary faces
    er_scatter = jnp.where(geom.bctype == BC_INTERIOR, er, E)
    R = R.at[er_scatter].add(contribR, mode="drop")

    return R * dofmask[:, None, :]


def dg_dt(system, geom: DGGeom, U, dofmask):
    """Max-characteristic-speed face sweep: min_e vol_e / sum_f dSV
    (DGCompFlow.hpp dt:197-406)."""
    E = U.shape[0]
    Ue = U * dofmask[:, None, :]
    el = geom.esuf[:, 0]
    er = geom.esuf[:, 1]
    B_l = eval_basis(geom.ndof, geom.xi_l) * dofmask[el][:, None, :]
    B_r = eval_basis(geom.ndof, geom.xi_r) * dofmask[er][:, None, :]
    sL = jnp.einsum("fck,fgk->fgc", Ue[el], B_l)
    sR = jnp.einsum("fck,fgk->fgc", Ue[er], B_r)

    gpf = geom.phys_gp(el, geom.xi_l)
    wt = geom.w_face[None, :] * geom.farea[:, None] * geom.fmask[:, None]
    dSV_l = wt * system.charvel(sL, geom.fn[:, None, :], gpf)  # (F,G)
    dSV_r = wt * system.charvel(sR, geom.fn[:, None, :], gpf)

    interior = (geom.bctype == BC_INTERIOR)[:, None]
    mx = jnp.where(interior, jnp.maximum(dSV_l, dSV_r), dSV_l).sum(axis=1)  # (F,)

    delt = jnp.zeros(E + 1, dtype=U.dtype)
    delt = delt.at[el].add(mx)
    er_scatter = jnp.where(geom.bctype == BC_INTERIOR, er, E)
    delt = delt.at[er_scatter].add(jnp.where(interior[:, 0], mx, 0.0), mode="drop")

    big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
    elemdt = geom.vol / jnp.maximum(delt[:E], 1e-300)
    return jnp.where(geom.emask > 0, elemdt, big).min()


def dg_initialize(system, geom: DGGeom, t):
    """L2 projection of the initial condition onto the modal basis
    (tk::initialize / eval_init, src/PDE/Integrate/Initialize.cpp)."""
    K = geom.ndof
    ngi = ng_init(K)
    vp, vw = gauss_tet(ngi)
    vp_j = jnp.asarray(vp, dtype=geom.vol.dtype)
    vw_j = jnp.asarray(vw, dtype=geom.vol.dtype)
    B = eval_basis(K, vp_j)  # (G,K)
    gp = geom.node0[:, None, :] + jnp.einsum("eij,gj->egi", geom.Jmat, vp_j)
    E = geom.nelem
    f = system.initialize(gp.reshape(-1, 3), t).reshape(E, -1, system.ncomp)
    # u_k = int f B_k / M_k ; both integrals carry the same vol factor
    proj = jnp.einsum("g,egc,gk->eck", vw_j, f, B)
    return proj / geom.mnorm[None, None, :]


def dg_cell_avg(U):
    """Cell averages: the 0th Dubiner dof is the mean."""
    return U[:, :, 0]
