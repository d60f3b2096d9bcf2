"""Riemann solvers (batched, component-major layout).

Counterpart of the reference's value-semantic RiemannSolver hierarchy
(src/PDE/Integrate/Riemann/{HLLC,LaxFriedrichs,Upwind,AUSM}.hpp), as pure
branch-free jnp functions: the reference's if/else wave selection becomes
`jnp.where` masks so a single vectorized evaluation covers every face.

LAYOUT: states are (5, n), normals (3, n) — the long face/point axis is
last so everything is elementwise 1-D vector math on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _prim(u, eos):
    rho = u[0]
    vel = u[1:4] / rho
    p = eos.pressure(rho, vel[0], vel[1], vel[2], u[4])
    a = eos.soundspeed(rho, p)
    return rho, vel, p, a


def _normal_flux(u, p, vn, fn):
    """Physical Euler flux projected on the face normal: (5, n)."""
    return jnp.stack(
        [
            u[0] * vn,
            u[1] * vn + p * fn[0],
            u[2] * vn + p * fn[1],
            u[3] * vn + p * fn[2],
            (u[4] + p) * vn,
        ]
    )


def lax_friedrichs(fn, uL, uR, eos):
    """Rusanov/Lax-Friedrichs flux (LaxFriedrichs.hpp:27-95)."""
    rhoL, velL, pL, aL = _prim(uL, eos)
    rhoR, velR, pR, aR = _prim(uR, eos)
    vnL = (velL * fn).sum(0)
    vnR = (velR * fn).sum(0)
    fl = _normal_flux(uL, pL, vnL, fn)
    fr = _normal_flux(uR, pR, vnR, fn)
    lam = jnp.maximum(aL, aR) + jnp.maximum(jnp.abs(vnL), jnp.abs(vnR))
    return 0.5 * (fl + fr - lam * (uR - uL))


def hllc(fn, uL, uR, eos):
    """HLLC flux with Roe-averaged signal velocities (HLLC.hpp:29-134)."""
    rhoL, velL, pL, aL = _prim(uL, eos)
    rhoR, velR, pR, aR = _prim(uR, eos)
    vnL = (velL * fn).sum(0)
    vnR = (velR * fn).sum(0)

    rlr = jnp.sqrt(rhoR / rhoL)
    rlr1 = 1.0 + rlr
    vnroe = (vnR * rlr + vnL) / rlr1
    aroe = (aR * rlr + aL) / rlr1

    Sl = jnp.minimum(vnL - aL, vnroe - aroe)
    Sr = jnp.maximum(vnR + aR, vnroe + aroe)
    Sm = (rhoR * vnR * (Sr - vnR) - rhoL * vnL * (Sl - vnL) + pL - pR) / (
        rhoR * (Sr - vnR) - rhoL * (Sl - vnL)
    )

    pStar = rhoL * (vnL - Sl) * (vnL - Sm) + pL

    def star(u, rho, vn, p, S):
        w = S - vn
        den = S - Sm
        return jnp.stack(
            [
                w * rho / den,
                (w * u[1] + (pStar - p) * fn[0]) / den,
                (w * u[2] + (pStar - p) * fn[1]) / den,
                (w * u[3] + (pStar - p) * fn[2]) / den,
                (w * u[4] - p * vn + pStar * Sm) / den,
            ]
        )

    uStarL = star(uL, rhoL, vnL, pL, Sl)
    uStarR = star(uR, rhoR, vnR, pR, Sr)

    fL = _normal_flux(uL, pL, vnL, fn)
    fR = _normal_flux(uR, pR, vnR, fn)
    fStarL = _normal_flux(uStarL, pStar, Sm, fn)
    fStarR = _normal_flux(uStarR, pStar, Sm, fn)

    return jnp.where(
        Sl > 0.0,
        fL,
        jnp.where(Sm > 0.0, fStarL, jnp.where(Sr >= 0.0, fStarR, fR)),
    )


def upwind(fn, uL, uR, vel):
    """Scalar upwind flux with prescribed velocity (Upwind.hpp:25-64).

    vel (C, 3, n), uL/uR (C, n), fn (3, n) -> (C, n).
    """
    swave = (vel * fn[None]).sum(1)  # (C, n)
    splus = 0.5 * (swave + jnp.abs(swave))
    sminus = 0.5 * (swave - jnp.abs(swave))
    return splus * uL + sminus * uR
