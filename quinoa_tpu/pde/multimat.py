"""Multi-material Euler (velocity equilibrium) for cell-centered DG(P0).

Counterpart of the reference's DGMultiMat + AUSM + MultiMatTerms
(src/PDE/MultiMat/DGMultiMat.hpp, src/PDE/Integrate/Riemann/AUSM.hpp:
32-250, src/PDE/Integrate/MultiMatTerms.cpp; model of Pelanti & Shyue
2019): nmat materials with volume fractions alpha_k, partial densities
alpha_k rho_k, a single (equilibrium) velocity, and material energies.

Unknown layout per element (MultiMatIndexing.hpp):
    [ alpha_k (nmat) | alpha_k rho_k (nmat) | rho u_i (3) |
      alpha_k rho_k E_k (nmat) ]              => ncomp = 3*nmat + 3

The AUSM+up flux additionally returns the Riemann-advected partial
pressures and the Riemann velocity, which feed the *non-conservative*
volume terms (alpha_k div(u) for the fraction equations, the
y_k grad(alpha p) work terms for the energies) — the per-cell
riemannDeriv face sums of the reference (Surface.cpp:282-289,
DGMultiMat.hpp:196-206) accumulated here through the faces-of-element
gather table.

This first version implements DG(P0) (finite volume), the discretization
the reference's multimat regression decks use with `scheme dg`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dg import DGGeom, BC_DIRICHLET, BC_SYMMETRY, BC_INTERIOR
from .eos import StiffenedGas


def volfrac_idx(nmat, k):
    return k


def density_idx(nmat, k):
    return nmat + k


def momentum_idx(nmat, i):
    return 2 * nmat + i


def energy_idx(nmat, k):
    return 2 * nmat + 3 + k


def _split_mach(mach):
    """AUSM+ split Mach/pressure polynomials (AUSM.hpp:200-250), f_a=1."""
    m1p = 0.5 * (mach + jnp.abs(mach))
    m1m = 0.5 * (mach - jnp.abs(mach))
    m2p = 0.25 * (mach + 1.0) ** 2
    m2m = -0.25 * (mach - 1.0) ** 2
    alph = 3.0 / 16.0  # (3/16)(-4+5 f_a^2), f_a = 1

    sup = jnp.abs(mach) >= 1.0
    msp = jnp.where(sup, m1p, m2p * (1.0 - 2.0 * m2m))
    msm = jnp.where(sup, m1m, m2m * (1.0 + 2.0 * m2p))
    psp = jnp.where(
        sup, m1p / jnp.where(mach == 0, 1.0, mach),
        m2p * ((2.0 - mach) - 16.0 * alph * mach * m2m),
    )
    psm = jnp.where(
        sup, m1m / jnp.where(mach == 0, 1.0, mach),
        m2m * ((-2.0 - mach) + 16.0 * alph * mach * m2p),
    )
    return msp, msm, psp, psm


class MultiMatSystem:
    """DG(P0) multi-material Euler with AUSM+up and non-conservative terms."""

    def __init__(self, problem):
        self.problem = problem
        self.nmat = problem.nmat
        self.eos: List[StiffenedGas] = list(problem.eos)
        self.ncomp = 3 * self.nmat + 3

    # -- state helpers --------------------------------------------------------

    def _prim(self, u):
        """Bulk rho, velocity, material pressures/enthalpies/soundspeeds."""
        nmat = self.nmat
        rho = sum(u[density_idx(nmat, k)] for k in range(nmat))
        vel = [u[momentum_idx(nmat, i)] / rho for i in range(3)]
        al, pm, hm, am = [], [], [], []
        for k in range(nmat):
            a = u[volfrac_idx(nmat, k)]
            rk = u[density_idx(nmat, k)] / a
            ek = u[energy_idx(nmat, k)] / a
            p = self.eos[k].pressure(rk, vel[0], vel[1], vel[2], ek)
            al.append(a)
            pm.append(p)
            hm.append(u[energy_idx(nmat, k)] + a * p)
            am.append(self.eos[k].soundspeed(rk, jnp.maximum(p, 1e-30)))
        return rho, vel, al, pm, hm, am

    def ausm(self, fn, uL, uR):
        """AUSM+up flux: returns (flux (C,n), ap_star (nmat,n), vriem (n,))."""
        nmat = self.nmat
        rhol, vell, all_, pml, hml, aml = self._prim(uL)
        rhor, velr, alr, pmr, hmr, amr = self._prim(uR)

        pl = sum(all_[k] * pml[k] for k in range(nmat))
        pr = sum(alr[k] * pmr[k] for k in range(nmat))

        # mixture speed of sound from averaged material states
        rho12 = 0.5 * (rhol + rhor)
        ac2 = 0.0
        for k in range(nmat):
            al12 = 0.5 * (all_[k] + alr[k])
            rm12 = 0.5 * (
                uL[density_idx(nmat, k)] / all_[k]
                + uR[density_idx(nmat, k)] / alr[k]
            )
            am12 = 0.5 * (aml[k] + amr[k])
            ac2 = ac2 + al12 * rm12 * am12 * am12
        ac12 = jnp.sqrt(ac2 / rho12)

        vnl = sum(vell[i] * fn[i] for i in range(3))
        vnr = sum(velr[i] * fn[i] for i in range(3))
        ml, mr = vnl / ac12, vnr / ac12
        mspl, msml, pspl, psml_ = _split_mach(ml)
        mspr, msmr, pspr, psmr = _split_mach(mr)

        m12 = mspl + msmr  # k_p = 0 (AUSM.hpp:127: k_u = k_p = 0)
        vriem = ac12 * m12
        p12 = pspl * pl + psmr * pr  # k_u = 0

        lp = 0.5 * (vriem + jnp.abs(vriem))
        lm = 0.5 * (vriem - jnp.abs(vriem))

        flx = [None] * self.ncomp
        for k in range(nmat):
            flx[volfrac_idx(nmat, k)] = lp * all_[k] + lm * alr[k]
            flx[density_idx(nmat, k)] = (
                lp * uL[density_idx(nmat, k)] + lm * uR[density_idx(nmat, k)]
            )
            flx[energy_idx(nmat, k)] = lp * hml[k] + lm * hmr[k]
        for i in range(3):
            flx[momentum_idx(nmat, i)] = (
                lp * uL[momentum_idx(nmat, i)]
                + lm * uR[momentum_idx(nmat, i)]
                + p12 * fn[i]
            )

        # Riemann-advected partial pressures: upwinded by the sign of vriem
        lpn = lp / (jnp.abs(vriem) + 1e-16)
        lmn = lm / (jnp.abs(vriem) + 1e-16)
        ap = []
        for k in range(nmat):
            apl = all_[k] * pml[k]
            apr = alr[k] * pmr[k]
            ap.append(
                jnp.where(
                    jnp.abs(lpn) > 1e-10,
                    apl,
                    jnp.where(jnp.abs(lmn) > 1e-10, apr, 0.5 * (apl + apr)),
                )
            )
        return jnp.stack(flx), jnp.stack(ap), vriem

    def bc_state(self, bctype, sL, fn):
        """Dirichlet handled by caller; Symmetry reflects velocity;
        Extrapolate copies (DGMultiMat.hpp BC state fns)."""
        nmat = self.nmat
        rho = sum(sL[density_idx(nmat, k)] for k in range(nmat))
        vel = jnp.stack(
            [sL[momentum_idx(nmat, i)] / rho for i in range(3)]
        )
        vn = (vel * fn).sum(0)
        velr = vel - 2.0 * vn * fn
        sym = sL.at[momentum_idx(nmat, 0)].set(rho * velr[0])
        sym = sym.at[momentum_idx(nmat, 1)].set(rho * velr[1])
        sym = sym.at[momentum_idx(nmat, 2)].set(rho * velr[2])
        return jnp.where(bctype == BC_SYMMETRY, sym, sL)

    def charvel(self, u, fn):
        nmat = self.nmat
        rho, vel, al, pm, hm, am = self._prim(u)
        ac = jnp.sqrt(
            sum(al[k] * (u[density_idx(nmat, k)] / al[k]) * am[k] ** 2
                for k in range(nmat)) / rho
        )
        vn = sum(vel[i] * fn[i] for i in range(3))
        return jnp.abs(vn) + ac

    # -- P0 rhs ----------------------------------------------------------------

    def rhs_p0(self, geom: DGGeom, U, t, accum_plan=None,
               want_delt=False):
        """Finite-volume rhs (C, E) including non-conservative terms.

        With a near/far fused plan and `fused_ok` (set by the solver
        when no coordinate-dependent BC is present), the whole face
        sweep — AUSM+up, riemannDeriv, velocity divergence, and the dt
        charvel row — runs in the fused Pallas kernels; want_delt then
        also returns the per-element summed face charvel for the time
        step (dt_p0's sweep for free)."""
        nmat, C = self.nmat, self.ncomp
        if (accum_plan is not None
                and getattr(accum_plan, "fused", None) is not None
                and getattr(self, "fused_ok", False)):
            from ..ops.face_fused import fused_face_pass_nearfar

            E = U.shape[1]
            facade = _FusedMMFacade(self)
            Up = jnp.concatenate(
                [U, jnp.zeros((3 * nmat + 1, E), U.dtype)], axis=0)
            acc, delt = fused_face_pass_nearfar(facade, geom,
                                                accum_plan, Up)
            R = acc[:C]
            dap = acc[C:C + 3 * nmat]
            divu = acc[C + 3 * nmat]
            R = R + self._nonconservative(geom, U, dap, divu)
            R = R * geom.emask
            return (R, delt) if want_delt else R
        if want_delt:
            raise ValueError("want_delt needs the fused face plan")
        uL = U[:, geom.el]
        uR0 = U[:, geom.er]
        interior = geom.bctype == BC_INTERIOR

        # boundary ghost states
        gp = geom.node0[:, geom.el]  # P0: cell anchor is fine for Dirichlet
        dirich = self.problem.solution(gp, t)
        uR = jnp.where(
            interior,
            uR0,
            jnp.where(
                geom.bctype == BC_DIRICHLET, dirich,
                self.bc_state(geom.bctype, uL, geom.fn),
            ),
        )

        flx, ap, vriem = self.ausm(geom.fn, uL, uR)
        wt = geom.farea * geom.fmask  # single-point face rule for P0

        contribL = -wt * flx
        contribR = wt * flx
        # riemannDeriv contributions: dap[3k+i] += wt ap_k fn_i ; div u term
        dapL = jnp.stack([wt * ap[k] * geom.fn[i] for k in range(nmat)
                          for i in range(3)])
        divL = wt * vriem

        if accum_plan is not None:
            # fused Pallas accumulation (ops/face_accum.py): conservative
            # fluxes, riemannDeriv, and the velocity divergence stacked
            # into one (C+3*nmat+1, F) pair of L/R contribution slabs
            from ..ops.face_accum import accumulate_faces

            XL = jnp.concatenate([contribL, dapL, divL[None]], axis=0)
            XR = jnp.concatenate([contribR, -dapL, -divL[None]], axis=0)
            acc = accumulate_faces(accum_plan, XL, XR)
            R = acc[:C]
            dap = acc[C:C + 3 * nmat]
            divu = acc[C + 3 * nmat]
        else:
            zc = jnp.zeros((C, 1), dtype=U.dtype)
            padL = jnp.concatenate([contribL, zc], axis=1)
            padR = jnp.concatenate([contribR, zc], axis=1)
            zd = jnp.zeros((3 * nmat, 1), dtype=U.dtype)
            dpad = jnp.concatenate([dapL, zd], axis=1)
            vpad = jnp.concatenate([divL, jnp.zeros((1,), U.dtype)])

            R = jnp.zeros((C, geom.nelem), dtype=U.dtype)
            dap = jnp.zeros((3 * nmat, geom.nelem), dtype=U.dtype)
            divu = jnp.zeros((geom.nelem,), dtype=U.dtype)
            for i in range(4):
                f = geom.fose[i]
                side = geom.fsideR[i]
                sgn = 1.0 - 2.0 * side  # +1 left side, -1 right side
                R = R + jnp.where(side > 0, padR[:, f], padL[:, f])
                dap = dap + sgn * dpad[:, f]
                divu = divu + sgn * vpad[f]

        R = R + self._nonconservative(geom, U, dap, divu)
        return R * geom.emask

    def _nonconservative(self, geom: DGGeom, U, dap, divu):
        """Non-conservative volume terms from the accumulated face sums
        (MultiMatTerms.cpp:140-170): alpha_k div(u) and the velocity-
        dotted pressure-gradient exchange in the material energies."""
        nmat, C = self.nmat, self.ncomp
        V = geom.vol * geom.emask + (1.0 - geom.emask)
        dap = dap / V
        divu = divu / V
        rho = sum(U[density_idx(nmat, k)] for k in range(nmat))
        vel = [U[momentum_idx(nmat, i)] / rho for i in range(3)]
        dap_tot = [
            sum(dap[3 * k + i] for k in range(nmat)) for i in range(3)
        ]
        ncf = [jnp.zeros_like(divu) for _ in range(C)]
        for k in range(nmat):
            ncf[volfrac_idx(nmat, k)] = U[volfrac_idx(nmat, k)] * divu
            y_k = U[density_idx(nmat, k)] / rho
            e = jnp.zeros_like(divu)
            for i in range(3):
                e = e - vel[i] * (y_k * dap_tot[i] - dap[3 * k + i])
            ncf[energy_idx(nmat, k)] = e
        return geom.vol * geom.emask * jnp.stack(ncf)

    def dt_p0(self, geom: DGGeom, U):
        uL = U[:, geom.el]
        uR = U[:, geom.er]
        wt = geom.farea * geom.fmask
        interior = geom.bctype == BC_INTERIOR
        dl = wt * self.charvel(uL, geom.fn)
        dr = wt * self.charvel(uR, geom.fn)
        mx = jnp.where(interior, jnp.maximum(dl, dr), dl)
        delt = sum(mx[geom.fose[i]] for i in range(4))
        big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
        elemdt = geom.vol / jnp.maximum(delt, 1e-300)
        return jnp.where(geom.emask > 0, elemdt, big).min()

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.solution(xyz, t)



class _FusedMMFacade:
    """Adapter presenting AUSM+up flux + riemannDeriv + velocity
    divergence as one (C + 3*nmat + 1)-row 'flux', so the generic fused
    near/far face kernels (ops/face_fused.py) accumulate multimat's
    conservative AND non-conservative face sums — and the dt charvel
    row — in a single pass (DGMultiMat.hpp rhs + Surface.cpp:282-289
    riemannDeriv).  The state rows beyond C are zero padding; signs are
    chosen so the kernel's (-L, +R) convention reproduces rhs_p0's
    (+dap at L, -dap at R) accumulation.
    """

    def __init__(self, mm: "MultiMatSystem"):
        self.mm = mm
        self.ncomp = mm.ncomp + 3 * mm.nmat + 1

    def bc_state(self, bctype, sL, fn, gp, t):
        C = self.mm.ncomp
        core = self.mm.bc_state(bctype, sL[:C], fn)
        return jnp.concatenate([core, sL[C:]], axis=0)

    def riemann(self, fn, sL, sR, gp, t):
        mm = self.mm
        C, nmat = mm.ncomp, mm.nmat
        flx, ap, vriem = mm.ausm(fn, sL[:C], sR[:C])
        dap = jnp.stack([ap[k] * fn[i] for k in range(nmat)
                         for i in range(3)])
        return jnp.concatenate([flx, -dap, -vriem[None]], axis=0)

    def charvel(self, s, fn, gp=None):
        return self.mm.charvel(s[:self.mm.ncomp], fn)


class MultiMatSolver:
    """SSP-RK3 DG(P0) driver for the multi-material system."""

    def __init__(self, system: MultiMatSystem, geom: DGGeom, cfl=0.5,
                 const_dt=None):
        if geom.ndof != 1:
            raise ValueError("multimat currently supports DG(P0) only")
        self.system = system
        self.geom = geom
        self.cfl = cfl
        self.const_dt = const_dt
        self.accum_plan = None
        import os

        if (jax.default_backend() == "tpu"
                and os.environ.get("QUINOA_TPU_NO_PALLAS") != "1"):
            try:
                from ..ops.face_accum import build_accum_plan

                self.accum_plan = build_accum_plan(geom)
            except Exception as e:
                import warnings

                warnings.warn(
                    "Pallas face-pass plan build failed; multimat "
                    f"falls back to the slow XLA gather path: {e!r}",
                    RuntimeWarning, stacklevel=2)
                self.accum_plan = None
        # the fused kernels can't evaluate coordinate-dependent BCs
        # (Dirichlet samples problem.solution at face points)
        system.fused_ok = not bool(
            np.isin(np.asarray(geom.bctype), [BC_DIRICHLET]).any())
        self._step = jax.jit(self._step_impl)

    def initial_state(self, t0=0.0):
        from ..inciter.dg import DGState

        g = self.geom
        # P0 projection = cell-centroid average via the init rule
        from .dg import dg_initialize

        u0 = dg_initialize(self.system, g, t0)
        dtype = g.vol.dtype
        return DGState(
            u=u0.astype(dtype),
            ndofel=jnp.ones((g.nelem,), dtype=jnp.int32),
            t=jnp.asarray(t0, dtype=dtype),
            it=jnp.asarray(0, dtype=jnp.int32),
            dt=jnp.asarray(0.0, dtype=dtype),
        )

    def step(self, state):
        return self._step(self.geom, self.accum_plan, state)

    def nsteps(self, state, n):
        for _ in range(n):
            state = self.step(state)
        return state

    def _step_impl(self, geom, accum_plan, state):
        from ..inciter.dg import DGState, RK0, RK1

        un = state.u
        u = un
        fused = (accum_plan is not None
                 and getattr(accum_plan, "fused", None) is not None
                 and getattr(self.system, "fused_ok", False))
        if self.const_dt is not None:
            dt = jnp.asarray(self.const_dt, dtype=geom.vol.dtype)
        elif not fused:
            dt = self.system.dt_p0(geom, u) * self.cfl
        minv = 1.0 / geom.vol
        for s in range(3):
            if fused and s == 0 and self.const_dt is None:
                # the fused pass emits the dt charvel sums with the rhs
                r, delt = self.system.rhs_p0(geom, u, state.t,
                                             accum_plan=accum_plan,
                                             want_delt=True)
                big = jnp.asarray(jnp.finfo(u.dtype).max, dtype=u.dtype)
                elemdt = geom.vol / jnp.maximum(delt, 1e-300)
                dt = jnp.where(geom.emask > 0, elemdt, big).min()                     * self.cfl
            else:
                r = self.system.rhs_p0(geom, u, state.t,
                                       accum_plan=accum_plan)
            u = RK0[s] * un + RK1[s] * (u + dt * r * minv)
        return DGState(u=u, ndofel=state.ndofel, t=state.t + dt,
                       it=state.it + 1, dt=dt)
