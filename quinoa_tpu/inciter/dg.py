"""DG solver driver: SSP-RK3 stepping with limiting and p-adaptivity.

Counterpart of the reference's DG chare array (src/Inciter/DG.cpp): the
per-stage SDAG pipeline (comsol -> lim -> dt -> solve) becomes a pure
jitted step: per stage, limit, (stage 0 only) evaluate p-adaptive dofs and
the global min dt, evaluate the rhs, and apply the RK update

    u = rk0[s]*un + rk1[s]*(u + dt*rhs/M)      (DG.cpp:39-40, 1479-1488)

with the block-diagonal mass matrix diagonal in the orthogonal Dubiner
basis (M_k = vol*mnorm_k).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..pde.dg import DGGeom, dg_rhs, dg_dt, dg_initialize
from ..pde.limiter import weno_p1, superbee_p1

RK0 = (0.0, 3.0 / 4.0, 1.0 / 3.0)
RK1 = (1.0, 1.0 / 4.0, 2.0 / 3.0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["u", "ndofel", "t", "it", "dt"],
    meta_fields=[],
)
@dataclasses.dataclass
class DGState:
    u: jnp.ndarray  # (E, C, K)
    ndofel: jnp.ndarray  # (E,) int32 active dofs per element (p-adaptive)
    t: jnp.ndarray
    it: jnp.ndarray
    dt: jnp.ndarray


class DGSolver:
    """Cell-centered DG(P0/P1/P2) solver on a single shard.

    limiter : None | 'wenop1' | 'superbeep1'
    pref    : enable p-adaptive DG (P1 <-> P0 by gradient indicator,
              DG.cpp:1088-1163); tolref is the indicator threshold.
    """

    def __init__(
        self,
        system,
        geom: DGGeom,
        cfl: float = 0.5,
        const_dt: Optional[float] = None,
        limiter: Optional[str] = None,
        cweight: float = 30.0,
        pref: bool = False,
        tolref: float = 0.5,
    ):
        self.system = system
        self.geom = geom
        self.cfl = cfl
        self.const_dt = const_dt
        if limiter not in (None, "wenop1", "superbeep1"):
            raise ValueError(f"unknown limiter {limiter!r}")
        if limiter is not None and geom.ndof < 4:
            raise ValueError("limiters require ndof >= 4")
        self.limiter = limiter
        self.cweight = cweight
        self.pref = pref
        self.tolref = tolref
        # CFL scaled by 1/(2p+1) (DG.cpp:1404-1419)
        p = {1: 0.0, 4: 1.0, 10: 2.0}[geom.ndof]
        self.cflscale = 1.0 / (2.0 * p + 1.0)
        self._step = jax.jit(self._step_impl)

    # -- helpers --------------------------------------------------------------

    def _dofmask(self, ndofel):
        K = self.geom.ndof
        k = jnp.arange(K)[None, :]
        return (k < ndofel[:, None]).astype(self.geom.vol.dtype)

    def _limit(self, u, dofmask):
        if self.limiter == "wenop1":
            return weno_p1(self.geom, u, dofmask, self.cweight)
        if self.limiter == "superbeep1":
            return superbee_p1(self.geom, u, dofmask)
        return u

    def _eval_ndof(self, u):
        """p-adaptive dof indicator: keep P1 where any component's gradient
        magnitude exceeds tolref (DG.cpp eval_ndof)."""
        g = self.geom
        # du/dxi from P1 dofs: (2u1, u1+3u2, u1+u2+4u3)
        u1, u2, u3 = u[:, :, 1], u[:, :, 2], u[:, :, 3]
        dudxi = jnp.stack(
            [2.0 * u1, u1 + 3.0 * u2, u1 + u2 + 4.0 * u3], axis=-1
        )  # (E,C,3)
        dudx = jnp.einsum("ecm,emj->ecj", dudxi, g.jacInv)
        grad = jnp.sqrt((dudx**2).sum(-1))  # (E,C)
        keep = (grad > self.tolref).any(axis=1)
        return jnp.where(keep, 4, 1).astype(jnp.int32)

    # -- public API -----------------------------------------------------------

    def initial_state(self, t0: float = 0.0) -> DGState:
        u0 = dg_initialize(self.system, self.geom, t0)
        dtype = self.geom.vol.dtype
        ndofel = jnp.full((self.geom.nelem,), self.geom.ndof, dtype=jnp.int32)
        return DGState(
            u=u0.astype(dtype),
            ndofel=ndofel,
            t=jnp.asarray(t0, dtype=dtype),
            it=jnp.asarray(0, dtype=jnp.int32),
            dt=jnp.asarray(0.0, dtype=dtype),
        )

    def step(self, state: DGState) -> DGState:
        return self._step(state)

    def nsteps(self, state: DGState, n: int) -> DGState:
        def body(s, _):
            return self._step_impl(s), None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    # -- implementation -------------------------------------------------------

    def _minv(self):
        return 1.0 / (self.geom.vol[:, None, None] * self.geom.mnorm[None, None, :])

    def _step_impl(self, state: DGState) -> DGState:
        g = self.geom
        un = state.u
        u = state.u
        ndofel = state.ndofel
        dt = state.dt
        minv = self._minv()

        for s in range(3):
            if s == 0 and self.pref and g.ndof >= 4:
                ndofel = self._eval_ndof(u)
            dofmask = self._dofmask(ndofel)
            u = self._limit(u, dofmask)
            if s == 0:
                if self.const_dt is not None:
                    dt = jnp.asarray(self.const_dt, dtype=g.vol.dtype)
                else:
                    dt = dg_dt(self.system, g, u, dofmask) * (
                        self.cfl * self.cflscale
                    )
            r = dg_rhs(self.system, g, u, dofmask, state.t)
            u = RK0[s] * un + RK1[s] * (u + dt * r * minv)
            u = jnp.where(dofmask[:, None, :] > 0, u, un)

        return DGState(
            u=u,
            ndofel=ndofel,
            t=state.t + dt,
            it=state.it + 1,
            dt=dt,
        )


class DGDiagnostics:
    """Element diagnostics: L2 norms via NGdiag-point quadrature
    (ElemDiagnostics.cpp)."""

    def __init__(self, system, geom: DGGeom):
        from ..ops.quadrature import gauss_tet, ng_diag
        from ..ops.basis import eval_basis
        import numpy as np

        self.system = system
        self.geom = geom
        pts, w = gauss_tet(ng_diag(geom.ndof))
        dtype = geom.vol.dtype
        self.pts = jnp.asarray(pts, dtype=dtype)
        self.w = jnp.asarray(w, dtype=dtype)
        self.B = eval_basis(geom.ndof, self.pts)  # (G,K)
        self.total_vol = float((geom.vol * geom.emask).sum())

    def compute(self, state: DGState):
        g = self.geom
        u = state.u
        state_gp = jnp.einsum("eck,gk->egc", u, self.B)  # (E,G,C)
        gp = g.node0[:, None, :] + jnp.einsum("eij,gj->egi", g.Jmat, self.pts)
        E, G, C = state_gp.shape
        a = self.system.analytic(gp.reshape(-1, 3), state.t).reshape(E, G, C)
        w = self.w[None, :, None] * (g.vol * g.emask)[:, None, None]
        l2sol = jnp.sqrt((w * state_gp**2).sum((0, 1)) / self.total_vol)
        err = state_gp - a
        l2err = jnp.sqrt((w * err**2).sum((0, 1)) / self.total_vol)
        linferr = jnp.abs(err * (g.emask[:, None, None] > 0)).max((0, 1))
        return (
            [float(v) for v in l2sol],
            [float(v) for v in l2err],
            [float(v) for v in linferr],
        )
