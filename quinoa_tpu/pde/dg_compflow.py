"""DG systems: compressible Euler (DGCompFlow) and scalar transport
(DGTransport), feature-major layout.

Counterparts of src/PDE/CompFlow/DGCompFlow.hpp and src/PDE/Transport/
DGTransport.hpp: each provides the flux/riemann/bc-state/src callbacks the
dg_rhs operator consumes.  States are (C, n), normals (3, n).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import riemann as rie
from .dg import BC_DIRICHLET, BC_SYMMETRY, BC_INLET
from .problems.compflow import euler_flux_dir


class DGCompFlow:
    """Compressible Euler for cell-centered DG.

    riemann_flux: 'hllc' (default) or 'laxfriedrichs' (deck: flux keyword).
    BC state functions follow DGCompFlow.hpp:620-720: Dirichlet (analytic
    solution), Symmetry (reflected velocity), Extrapolate (copy).
    """

    ncomp = 5

    def __init__(self, problem, riemann_flux: str = "hllc"):
        self.problem = problem
        self.eos = problem.eos
        if riemann_flux not in ("hllc", "laxfriedrichs"):
            raise ValueError(f"unknown flux {riemann_flux!r} for compflow DG")
        self.riemann_flux = riemann_flux
        self.has_src = getattr(problem, "manufactured", False)

    # -- DGPDE protocol -------------------------------------------------------

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.analytic(xyz, t)

    def src(self, xyz, t):
        return self.problem.src(xyz, t)

    def flux_cols(self, state, gp, t):
        """The three flux columns [F_x, F_y, F_z], each (5, n)."""
        p = self.eos.pressure_cons_cm(state)
        return [euler_flux_dir(state, p, j) for j in range(3)]

    def riemann(self, fn, sL, sR, gp, t):
        if self.riemann_flux == "hllc":
            return rie.hllc(fn, sL, sR, self.eos)
        return rie.lax_friedrichs(fn, sL, sR, self.eos)

    #: compflow's flux/riemann never sample face Gauss-point coordinates;
    #: they are only needed for Dirichlet/inlet ghosts (dg_rhs skips the
    #: gpf construction when the deck has none of those faces)
    needs_face_gp = False
    #: flux_cols ignores gp AND t entirely — the invariant the fused
    #: limit+volume kernel relies on when it evaluates the volume
    #: integral at gp=None, t=0 (transport velocity fields are NOT
    #: coord-free and must never set this)
    coord_free_flux = True

    def bc_state(self, bctype, sL, fn, gp, t):
        """Ghost state for boundary faces (interior overridden by caller).
        gp None means the caller proved no bc needs coordinates."""
        rho = sL[0]
        vel = sL[1:4] / rho
        vn = (vel * fn).sum(0)
        velr = vel - 2.0 * vn * fn
        sym = jnp.concatenate([sL[0:1], rho * velr, sL[4:5]])

        out = jnp.where(bctype == BC_SYMMETRY, sym, sL)
        if gp is None:
            return out
        dirich = self.problem.solution(gp, t)
        return jnp.where(bctype == BC_DIRICHLET, dirich, out)

    def charvel(self, state, fn, gp=None):
        """|v.n| + a at face states, for the dt sweep."""
        rho = state[0]
        vel = state[1:4] / rho
        p = jnp.maximum(self.eos.pressure_cons_cm(state), 0.0)
        a = self.eos.soundspeed(rho, p)
        return jnp.abs((vel * fn).sum(0)) + a


class DGTransport:
    """Linear advection of N scalars for cell-centered DG (upwind flux),
    counterpart of src/PDE/Transport/DGTransport.hpp."""

    has_src = False

    def __init__(self, problem, ncomp=None):
        self.problem = problem
        self.ncomp = ncomp if ncomp is not None else problem.ncomp

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.solution(xyz, t)

    def src(self, xyz, t):
        return jnp.zeros((self.ncomp,) + xyz.shape[1:], dtype=xyz.dtype)

    def flux_cols(self, state, gp, t):
        """F_j[c] = v_j(x)[c] * u[c]."""
        vel = self.problem.velocity(gp, t)  # (C, 3, n)
        return [state * vel[:, j, :] for j in range(3)]

    def riemann(self, fn, sL, sR, gp, t):
        vel = self.problem.velocity(gp, t)
        return rie.upwind(fn, sL, sR, vel)

    def bc_state(self, bctype, sL, fn, gp, t):
        """Dirichlet: analytic solution; Inlet: zero; Outlet/Extrapolate:
        copy (DGTransport.hpp:340-400)."""
        dirich = self.problem.solution(gp, t)
        return jnp.where(
            bctype == BC_DIRICHLET,
            dirich,
            jnp.where(bctype == BC_INLET, 0.0, sL),
        )

    def charvel(self, state, fn, gp=None):
        """max over components of |v.n| for the dt face sweep."""
        vel = self.problem.velocity(gp, 0.0)  # (C, 3, n)
        return jnp.abs((vel * fn[None]).sum(1)).max(0)
