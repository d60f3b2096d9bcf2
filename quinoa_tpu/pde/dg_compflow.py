"""DG systems: compressible Euler (DGCompFlow) and scalar transport
(DGTransport).

Counterparts of src/PDE/CompFlow/DGCompFlow.hpp and src/PDE/Transport/
DGTransport.hpp: each provides the flux/riemann/bc-state/src callbacks the
dg_rhs operator consumes, batched over faces and Gauss points.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import riemann as rie
from .cg_compflow import euler_flux
from .dg import BC_DIRICHLET, BC_SYMMETRY, BC_EXTRAPOLATE


class DGCompFlow:
    """Compressible Euler for cell-centered DG.

    riemann_flux: 'hllc' (default) or 'laxfriedrichs' (deck: flux keyword).
    BC state functions follow DGCompFlow.hpp: Dirichlet (analytic solution),
    Symmetry (reflected velocity), Extrapolate (copy).
    """

    ncomp = 5

    def __init__(self, problem, riemann_flux: str = "hllc"):
        self.problem = problem
        self.eos = problem.eos
        if riemann_flux not in ("hllc", "laxfriedrichs"):
            raise ValueError(f"unknown flux {riemann_flux!r} for compflow DG")
        self.riemann_flux = riemann_flux

    # -- DGPDE protocol -----------------------------------------------------

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.analytic(xyz, t)

    def src(self, xyz, t):
        return self.problem.src(xyz, t)

    def flux(self, state, gp=None, t=None):
        """Volume flux F[..., C, 3] from conservative states (..., C)."""
        p = self.eos.pressure_cons(state)
        return euler_flux(state, p)

    def riemann(self, fn, sL, sR, gp, t):
        if self.riemann_flux == "hllc":
            return rie.hllc(fn, sL, sR, self.eos)
        return rie.lax_friedrichs(fn, sL, sR, self.eos)

    def bc_state(self, bctype, sL, fn, gp, t):
        """Ghost state for boundary faces (interior faces are overridden
        by the caller)."""
        bt = bctype[:, None, None]

        # Dirichlet: analytic solution at the face Gauss point
        F, G, _ = gp.shape
        dirich = self.problem.solution(gp.reshape(-1, 3), t).reshape(F, G, 5)

        # Symmetry: reflect velocity about the normal
        rho = sL[..., 0:1]
        vel = sL[..., 1:4] / rho
        vn = (vel * fn).sum(-1, keepdims=True)
        velr = vel - 2.0 * vn * fn
        sym = jnp.concatenate([sL[..., 0:1], rho * velr, sL[..., 4:5]], axis=-1)

        return jnp.where(
            bt == BC_DIRICHLET,
            dirich,
            jnp.where(bt == BC_SYMMETRY, sym, sL),
        )

    def charvel(self, state, fn, gp=None):
        """|v.n| + a at face states, for the dt sweep."""
        rho = state[..., 0]
        vel = state[..., 1:4] / rho[..., None]
        p = jnp.maximum(self.eos.pressure_cons(state), 0.0)
        a = self.eos.soundspeed(rho, p)
        vn = (vel * fn).sum(-1)
        return jnp.abs(vn) + a


class DGTransport:
    """Linear advection of N scalars for cell-centered DG (upwind flux),
    counterpart of src/PDE/Transport/DGTransport.hpp."""

    def __init__(self, problem, ncomp=None):
        self.problem = problem
        self.ncomp = ncomp if ncomp is not None else problem.ncomp

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.solution(xyz, t)

    def src(self, xyz, t):
        return jnp.zeros((xyz.shape[0], self.ncomp), dtype=xyz.dtype)

    def flux(self, state, gp, t):
        """F[..., c, j] = v_j(x) * u_c with prescribed velocity."""
        F, G, C = state.shape
        vel = self.problem.velocity(gp.reshape(-1, 3), t).reshape(F, G, C, 3)
        return state[..., None] * vel

    def riemann(self, fn, sL, sR, gp, t):
        F, G, C = sL.shape
        vel = self.problem.velocity(gp.reshape(-1, 3), t).reshape(F, G, C, 3)
        return rie.upwind(fn, sL, sR, vel)

    def bc_state(self, bctype, sL, fn, gp, t):
        bt = bctype[:, None, None]
        F, G, C = sL.shape
        dirich = self.problem.solution(gp.reshape(-1, 3), t).reshape(F, G, C)
        return jnp.where(bt == BC_DIRICHLET, dirich, sL)

    def charvel(self, state, fn, gp=None):
        """max over components of |v.n| for the dt face sweep."""
        F, G, C = state.shape
        vel = self.problem.velocity(gp.reshape(-1, 3), 0.0).reshape(F, G, C, 3)
        return jnp.abs((vel * fn[..., None, :]).sum(-1)).max(-1)
