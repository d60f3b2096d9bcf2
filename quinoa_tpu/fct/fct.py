"""Flux-corrected transport (FEM-FCT), feature-major layout.

Re-design of the reference's FluxCorrector/DistFCT pair
(src/Inciter/FluxCorrector.cpp: aec:30, lump:238, diff:281, alw:339,
lim:389; src/Inciter/DistFCT.hpp:100-226) after

  Löhner, Morgan, Peraire, Vahdati (1987): Finite element flux-corrected
  transport (FEM-FCT) for the Euler and Navier-Stokes equations.
  Int. J. Numer. Meth. Fluids 7:1093-1109.

All node fields are (C, N), element slabs (4, C, E); assembly is
gather-based.  In the sharded solver the P/Q/A buffers are combined across
shards by the halo layer between passes (sum for P and A, max/min for Q),
replacing DistFCT's comaec/comalw/comlim messages.

The low/high-order pair is the diagonally-lumped Taylor-Galerkin of
DiagCG: high order = lumped-mass TG (dUh enters the AEC as zero), low
order = high order + mass diffusion c_tau*(M_c-M_L)Un.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.assembly import (
    gather_nodes,
    assemble_add,
    assemble_max,
    assemble_min,
)
from ..pde.cg import CGGeom


class FCT:
    """FEM-FCT limiter for the diagonally-lumped Taylor-Galerkin scheme."""

    def __init__(self, ctau: float = 1.0):
        #: mass-diffusion coefficient; 1.0 guarantees monotonicity
        self.ctau = ctau

    # (M_L - M_c) of a tet: diag 3J/120, off-diag -J/120; applied as
    # y_a = (J/120)(4 x_a - sum_b x_b)  (FluxCorrector.cpp aec/diff).

    def _mass_lumped_minus_consistent(self, geom: CGGeom, X):
        """(M_Le - M_ce) @ X per element: X (4, C, E) -> (4, C, E)."""
        j = (geom.J * geom.emask) / 120.0
        s = X.sum(axis=0)
        return j * (4.0 * X - s)

    def diff(self, geom: CGGeom, Un):
        """Mass-diffusion rhs of the low-order system: (C, N) partials.

        D_a = -c_tau (M_Le - M_ce) Un scattered to nodes
        (FluxCorrector::diff:281-338).
        """
        un = gather_nodes(Un, geom.inpoelT)
        contrib = -self.ctau * self._mass_lumped_minus_consistent(geom, un)
        return assemble_add(contrib, geom.nsup)

    def aec(self, geom: CGGeom, dUh, Un, bcmask):
        """Antidiffusive element contributions + nodal P sums.

        AEC = M_L^{-1} (M_Le - M_ce)(ctau*Un + dUh); dUh enters as zero for
        the lumped-mass high-order scheme (FluxCorrector::aec:30-170).
        AECs at Dirichlet-BC nodes are zeroed.

        bcmask : (C, N) 1.0 where a Dirichlet BC is set.
        Returns (aec (4, C, E), P (2, C, N)).
        """
        un = gather_nodes(Un, geom.inpoelT)
        me = self._mass_lumped_minus_consistent(geom, self.ctau * un)
        vol_n = jnp.stack(
            [geom.vol[geom.inpoelT[a]] for a in range(4)]
        )  # (4, E)
        aec = me / vol_n[:, None, :]

        bc_n = gather_nodes(bcmask, geom.inpoelT)  # (4, C, E)
        aec = jnp.where(bc_n > 0, 0.0, aec)

        pos = assemble_add(jnp.maximum(aec, 0.0), geom.nsup)
        neg = assemble_add(jnp.minimum(aec, 0.0), geom.nsup)
        return aec, jnp.stack([pos, neg])

    def alw(self, geom: CGGeom, Un, Ul):
        """Allowed max/min around nodes: Q (2, C, N) partials.

        S_el = extrema over the element's nodes of max/min(Ul,Un); Q_i is
        the extremum of S_el over elements around i (alw:339-388).
        """
        big = jnp.asarray(jnp.finfo(Un.dtype).max, dtype=Un.dtype)
        smax = gather_nodes(jnp.maximum(Ul, Un), geom.inpoelT)  # (4,C,E)
        smin = gather_nodes(jnp.minimum(Ul, Un), geom.inpoelT)
        s_max_el = smax.max(axis=0)  # (C, E)
        s_min_el = smin.min(axis=0)
        pad = geom.emask <= 0
        s_max_el = jnp.where(pad, -big, s_max_el)
        s_min_el = jnp.where(pad, big, s_min_el)

        qmax = assemble_max(
            jnp.broadcast_to(s_max_el[None], smax.shape), geom.nsup
        )
        qmin = assemble_min(
            jnp.broadcast_to(s_min_el[None], smin.shape), geom.nsup
        )
        return jnp.stack([qmax, qmin])

    def lim(self, geom: CGGeom, aec, P, Q, Ul):
        """Limited antidiffusive contributions assembled to nodes: (C, N).

        Monotonicity ratios R^{+,-}, element coefficient C_el = min over
        the element's nodes, applied to the AECs (lim:389-470).
        """
        eps = jnp.asarray(jnp.finfo(Ul.dtype).eps, dtype=Ul.dtype)
        big = jnp.asarray(jnp.finfo(Ul.dtype).max, dtype=Ul.dtype)

        Qp = Q[0] - Ul
        Qm = Q[1] - Ul

        Rp = jnp.where(
            P[0] > 0.0,
            jnp.minimum(1.0, Qp / jnp.where(P[0] > 0.0, P[0], 1.0)),
            0.0,
        )
        Rm = jnp.where(
            P[1] < 0.0,
            jnp.minimum(1.0, Qm / jnp.where(P[1] < 0.0, P[1], 1.0)),
            0.0,
        )

        rp = gather_nodes(Rp, geom.inpoelT)  # (4, C, E)
        rm = gather_nodes(Rm, geom.inpoelT)
        r = jnp.where(jnp.abs(aec) < eps, big, jnp.where(aec > 0.0, rp, rm))
        Cel = jnp.minimum(r.min(axis=0), 1.0)  # (C, E)

        return assemble_add(Cel[None] * aec, geom.nsup)
