"""Riemann solvers (batched over faces/quadrature points).

Counterpart of the reference's value-semantic RiemannSolver hierarchy
(src/PDE/Integrate/Riemann/{HLLC,LaxFriedrichs,Upwind,AUSM}.hpp), as pure
branch-free jnp functions: the reference's if/else wave selection becomes
`jnp.where` masks so a single vectorized evaluation covers every face.

All take (fn (...,3) unit normals, uL/uR (...,5) conservative states) and
an EoS, and return the numerical flux (...,5).
"""

from __future__ import annotations

import jax.numpy as jnp


def _prim(u, eos):
    rho = u[..., 0]
    vel = u[..., 1:4] / rho[..., None]
    p = eos.pressure(rho, vel[..., 0], vel[..., 1], vel[..., 2], u[..., 4])
    a = eos.soundspeed(rho, p)
    return rho, vel, p, a


def _normal_flux(u, p, vn, fn):
    """Physical Euler flux projected on the face normal."""
    return jnp.stack(
        [
            u[..., 0] * vn,
            u[..., 1] * vn + p * fn[..., 0],
            u[..., 2] * vn + p * fn[..., 1],
            u[..., 3] * vn + p * fn[..., 2],
            (u[..., 4] + p) * vn,
        ],
        axis=-1,
    )


def lax_friedrichs(fn, uL, uR, eos):
    """Rusanov/Lax-Friedrichs flux (LaxFriedrichs.hpp:27-95)."""
    rhoL, velL, pL, aL = _prim(uL, eos)
    rhoR, velR, pR, aR = _prim(uR, eos)
    vnL = (velL * fn).sum(-1)
    vnR = (velR * fn).sum(-1)
    fl = _normal_flux(uL, pL, vnL, fn)
    fr = _normal_flux(uR, pR, vnR, fn)
    lam = jnp.maximum(aL, aR) + jnp.maximum(jnp.abs(vnL), jnp.abs(vnR))
    return 0.5 * (fl + fr - lam[..., None] * (uR - uL))


def hllc(fn, uL, uR, eos):
    """HLLC flux with Roe-averaged signal velocities (HLLC.hpp:29-134)."""
    rhoL, velL, pL, aL = _prim(uL, eos)
    rhoR, velR, pR, aR = _prim(uR, eos)
    vnL = (velL * fn).sum(-1)
    vnR = (velR * fn).sum(-1)

    # Roe-averaged normal velocity and sound speed
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
                (w * u[..., 1] + (pStar - p) * fn[..., 0]) / den,
                (w * u[..., 2] + (pStar - p) * fn[..., 1]) / den,
                (w * u[..., 3] + (pStar - p) * fn[..., 2]) / den,
                (w * u[..., 4] - p * vn + pStar * Sm) / den,
            ],
            axis=-1,
        )

    uStarL = star(uL, rhoL, vnL, pL, Sl)
    uStarR = star(uR, rhoR, vnR, pR, Sr)

    fL = _normal_flux(uL, pL, vnL, fn)
    fR = _normal_flux(uR, pR, vnR, fn)
    fStarL = _normal_flux(uStarL, pStar, Sm * jnp.ones_like(pStar), fn)
    fStarR = _normal_flux(uStarR, pStar, Sm * jnp.ones_like(pStar), fn)

    Sl_ = Sl[..., None]
    Sm_ = Sm[..., None]
    Sr_ = Sr[..., None]
    return jnp.where(
        Sl_ > 0.0,
        fL,
        jnp.where(
            Sm_ > 0.0,
            fStarL,
            jnp.where(Sr_ >= 0.0, fStarR, fR),
        ),
    )


def upwind(fn, uL, uR, vel):
    """Scalar upwind flux with prescribed velocity (Upwind.hpp:25-64).

    vel : (..., ncomp, 3) prescribed velocity at the quadrature point.
    uL/uR : (..., ncomp).
    """
    swave = (vel * fn[..., None, :]).sum(-1)  # (..., ncomp)
    splus = 0.5 * (swave + jnp.abs(swave))
    sminus = 0.5 * (swave - jnp.abs(swave))
    return splus * uL + sminus * uR
