"""CGCompFlow: node-centered Euler, two-stage Taylor-Galerkin
(feature-major layout).

Counterpart of the reference's CGCompFlow (src/PDE/CompFlow/CGCompFlow.hpp:
rhs 185-350, dt 352-430): stage 1 gathers nodal conservative states and
forms element intermediates at t+dt/2 from the divergence of the Euler
flux (plus optional manufactured source at the nodes); stage 2 assembles
element fluxes (evaluated on the intermediate state) back to nodes, with
the source at the element center at t+dt/2.

All fields are (5, N)/(5, E); flux directions are handled as three (5, E)
columns so no materialized temp carries more than one small leading axis.
Viscous/heat-conduction hooks mirror the reference, where they are
declared but disabled (CGCompFlow.hpp:343-346 commented out).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.assembly import gather_nodes, assemble_add
from .cg import CGGeom
from .problems.compflow import euler_flux_dir


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
        return assemble_add(
            self.rhs_contrib(t, dt, geom, U,
                             gather_nodes(U, geom.inpoelT)),
            geom.nsup,
        )

    def rhs_contrib(self, t, dt, geom: CGGeom, U, un):
        """Element-node rhs contributions (4, 5, E), pre-assembly."""
        C, E = 5, geom.nelem

        # stage 1: element intermediate at t + dt/2
        divF = jnp.zeros((C, E), dtype=U.dtype)
        for a in range(4):
            p_a = self.eos.pressure_cons_cm(un[a])
            for j in range(3):
                divF = divF + geom.grad[a, j] * euler_flux_dir(un[a], p_a, j)
        ue = un.mean(axis=0) - 0.5 * dt * divF

        # nodal source (manufactured problems only)
        if getattr(self.problem, "manufactured", False):
            from .cg import cg_coords_n

            cn = cg_coords_n(geom)
            s = jnp.zeros((C, E), dtype=U.dtype)
            for a in range(4):
                s = s + self.problem.src(cn[a], t)
            ue = ue + 0.5 * dt * s / 4.0

        # stage 2: element fluxes assembled to nodes
        p_e = self.eos.pressure_cons_cm(ue)  # (E,)
        F = [euler_flux_dir(ue, p_e, j) for j in range(3)]  # 3 x (5, E)
        d = dt * geom.J * geom.emask / 6.0
        contrib = jnp.stack(
            [d * sum(geom.grad[a, j] * F[j] for j in range(3)) for a in range(4)]
        )  # (4, 5, E)

        if getattr(self.problem, "manufactured", False):
            from .cg import cg_ctr

            s_c = self.problem.src(cg_ctr(geom), t + 0.5 * dt)  # (5, E)
            contrib = contrib + (d / 4.0) * s_c[None]

        return contrib

    # -- ALECG callbacks ----------------------------------------------------

    def flux_at_nodes(self, u, xyz):
        """Three flux columns at nodal states u (5, n)."""
        p = self.eos.pressure_cons_cm(u)
        return [euler_flux_dir(u, p, j) for j in range(3)]

    def charspeed(self, u, xyz):
        """|v| + c at nodal states (for edge Rusanov dissipation)."""
        rho = u[0]
        p = jnp.maximum(self.eos.pressure_cons_cm(u), 0.0)
        c = self.eos.soundspeed(rho, p)
        return jnp.sqrt(u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / rho + c

    def dt(self, geom: CGGeom, U):
        """Min over elements of L / max_nodes(|v| + c) (before CFL)."""
        un = gather_nodes(U, geom.inpoelT)  # (4, 5, E)
        maxvel = None
        for a in range(4):
            u = un[a]
            rho = u[0]
            p = jnp.maximum(self.eos.pressure_cons_cm(u), 0.0)
            c = self.eos.soundspeed(rho, p)
            v = jnp.sqrt(u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / rho + c
            maxvel = v if maxvel is None else jnp.maximum(maxvel, v)
        L = jnp.cbrt(geom.J / 6.0)
        elemdt = L / maxvel
        big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
        return jnp.where(geom.emask > 0, elemdt, big).min()
