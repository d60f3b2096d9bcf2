"""CGCompFlow: node-centered Euler with two-stage Taylor-Galerkin.

Counterpart of the reference's CGCompFlow (src/PDE/CompFlow/CGCompFlow.hpp:
rhs 185-350, dt 352-430): stage 1 gathers nodal conservative states and
forms element intermediates at t+dt/2 from the divergence of the Euler flux
(plus optional manufactured source at the nodes); stage 2 scatter-adds
element fluxes (evaluated on the intermediate state) back to nodes, with
the source evaluated at the element center at t+dt/2.

Implements the same CGPDE protocol as CGTransport so the DiagCG driver and
the SPMD wrapper work unchanged.  Viscous/heat-conduction hooks
(NavierStokes physics) mirror the reference, where they are declared but
disabled (CGCompFlow.hpp:343-346 commented out).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.scatter import gather_nodes, scatter_add_nodes
from .cg import CGGeom


def euler_flux(U: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Inviscid flux F[..., c, j] for conservative states U[..., 5]."""
    rho = U[..., 0:1]
    vel = U[..., 1:4] / rho  # (..., 3)
    Fm = U[..., 1:4]  # mass row
    # momentum block: rho u_i u_j + p delta_ij
    Fmom = U[..., 1:4, None] * vel[..., None, :]
    eye = jnp.eye(3, dtype=U.dtype)
    Fmom = Fmom + p[..., None, None] * eye
    Fe = (U[..., 4:5] + p[..., None]) * vel
    return jnp.concatenate(
        [Fm[..., None, :], Fmom, Fe[..., None, :]], axis=-2
    )  # (..., 5, 3)


class CGCompFlow:
    """Compressible Euler flow (5 components) for node-centered schemes."""

    ncomp = 5

    def __init__(self, problem):
        self.problem = problem
        self.eos = problem.eos

    # -- CGPDE protocol -----------------------------------------------------

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.analytic(xyz, t)

    def solinc(self, xyz, t, dt):
        return self.problem.solinc(xyz, t, dt)

    def rhs(self, t, dt, geom: CGGeom, U):
        x = geom.coords
        un = gather_nodes(U, geom.inpoel)  # (E,4,5)

        # stage 1: element intermediate at t + dt/2
        p_n = self.eos.pressure_cons(un)  # (E,4)
        F_n = euler_flux(un, p_n)  # (E,4,5,3)
        divF = jnp.einsum("eaj,eacj->ec", geom.grad, F_n)  # (E,5)
        ue = un.mean(axis=1) - 0.5 * dt * divF

        # nodal source (manufactured problems only)
        xyz_n = x[geom.inpoel].reshape(-1, 3)
        s_n = self.problem.src(xyz_n, t).reshape(geom.nelem, 4, 5)
        ue = ue + 0.5 * dt * s_n.mean(axis=1)

        # stage 2: scatter element fluxes to nodes
        p_e = self.eos.pressure_cons(ue)  # (E,)
        F_e = euler_flux(ue, p_e)  # (E,5,3)
        d = dt * geom.J * geom.emask / 6.0
        contrib = d[:, None, None] * jnp.einsum("eaj,ecj->eac", geom.grad, F_e)

        ctr = x[geom.inpoel].mean(axis=1)
        s_c = self.problem.src(ctr, t + 0.5 * dt)  # (E,5)
        contrib = contrib + (d / 4.0)[:, None, None] * s_c[:, None, :]

        return scatter_add_nodes(contrib, geom.inpoel, geom.nnode)

    def dt(self, geom: CGGeom, U):
        """Min over elements of L / max_nodes(|v| + c) (before CFL)."""
        un = gather_nodes(U, geom.inpoel)  # (E,4,5)
        rho = un[..., 0]
        p = jnp.maximum(self.eos.pressure_cons(un), 0.0)
        c = self.eos.soundspeed(rho, p)
        speed = jnp.sqrt((un[..., 1:4] ** 2).sum(-1)) / rho + c
        maxvel = speed.max(axis=1)
        L = jnp.cbrt(geom.J / 6.0)
        elemdt = L / maxvel
        big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
        return jnp.where(geom.emask > 0, elemdt, big).min()
