"""Compressible-flow (Euler) problem policies.

Vectorized jnp re-implementations of the reference problem policies
(src/PDE/CompFlow/Problem/{VorticalFlow,TaylorGreen,SodShocktube,
RotatedSodShocktube,SedovBlastwave,NLEnergyGrowth,RayleighTaylor,
UserDefined}.cpp).  Conservative components: (rho, rho*u, rho*v, rho*w, rhoE).

Manufactured-solution source terms are *derived by automatic
differentiation* instead of transcribing the reference's hand-derived
formulas: for a manufactured solution U(x,t) of the Euler system the source
is exactly

    S(x,t) = dU/dt + div F(U),   F = inviscid flux,

which `jax.jacfwd` evaluates to machine precision.  This is mathematically
identical to the reference's closed forms (e.g. VorticalFlow.cpp:80-140,
RayleighTaylor.cpp:99-190, NLEnergyGrowth.cpp:130-190) by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..eos import StiffenedGas


def euler_flux_point(U: jnp.ndarray, eos: StiffenedGas) -> jnp.ndarray:
    """Inviscid flux F[c, j] for one conservative state U (5,)."""
    rho = U[0]
    vel = U[1:4] / rho  # (3,)
    p = eos.pressure(rho, vel[0], vel[1], vel[2], U[4])
    Fm = U[0] * vel  # mass flux row = momentum
    Fmom = jnp.outer(U[1:4], vel) + p * jnp.eye(3, dtype=U.dtype)
    Fe = (U[4] + p) * vel
    return jnp.concatenate([Fm[None, :], Fmom, Fe[None, :]], axis=0)  # (5,3)


class CompFlowProblem:
    """Base: batch API via vmap over the point-wise analytic solution."""

    ncomp: int = 5
    eos: StiffenedGas = StiffenedGas(gamma=1.4)
    #: True if the analytic solution satisfies the Euler system only with a
    #: manufactured source (computed via autodiff).
    manufactured: bool = False

    # subclasses implement: sol_point(p (3,), t) -> (5,)

    def solution(self, xyz, t):
        t = jnp.asarray(t, dtype=xyz.dtype)
        return jax.vmap(lambda p: self.sol_point(p, t))(xyz)

    def analytic(self, xyz, t):
        return self.solution(xyz, t)

    def solinc(self, xyz, t, dt):
        return self.solution(xyz, t + dt) - self.solution(xyz, t)

    def src(self, xyz, t):
        """Manufactured source S = dU/dt + div F(U), or zeros."""
        if not self.manufactured:
            return jnp.zeros((xyz.shape[0], 5), dtype=xyz.dtype)
        t = jnp.asarray(t, dtype=xyz.dtype)

        def src_point(p):
            dUdt = jax.jacfwd(self.sol_point, argnums=1)(p, t)
            JF = jax.jacfwd(
                lambda q: euler_flux_point(self.sol_point(q, t), self.eos)
            )(p)  # (5, 3, 3): dF[c,j]/dx[k]
            divF = jnp.trace(JF, axis1=1, axis2=2)
            return dUdt + divF

        return jax.vmap(src_point)(xyz)


@dataclasses.dataclass(frozen=True)
class VorticalFlow(CompFlowProblem):
    """Steady vortical flow manufactured solution (VorticalFlow.cpp:28-64).

    Deck defaults from the reference regression
    (tests/regression/inciter/compflow/Euler/VorticalFlow/vortical_flow.q):
    alpha=0.1, beta=1.0, p0=10.
    """

    alpha: float = 0.1
    beta: float = 1.0
    p0: float = 10.0
    eos: StiffenedGas = StiffenedGas(gamma=5.0 / 3.0)  # regression decks use 5/3
    manufactured: bool = True

    def sol_point(self, p, t):
        a, b, g = self.alpha, self.beta, self.eos.gamma
        x, y, z = p[0], p[1], p[2]
        ru = a * x - b * y
        rv = b * x + a * y
        rw = -2.0 * a * z
        rE = (ru * ru + rv * rv + rw * rw) / 2.0 + (
            self.p0 - 2.0 * a * a * z * z
        ) / (g - 1.0)
        return jnp.stack([jnp.ones_like(x), ru, rv, rw, rE])


@dataclasses.dataclass(frozen=True)
class TaylorGreen(CompFlowProblem):
    """Steady 2-D Taylor-Green vortex manufactured solution
    (TaylorGreen.cpp:28-90; the source has an energy component only; its
    closed form 3*pi/8*(cos3pix cospiy - cos3piy cospix) assumes gamma=5/3,
    which is what all reference TaylorGreen decks set)."""

    eos: StiffenedGas = StiffenedGas(gamma=5.0 / 3.0)
    manufactured: bool = True

    def sol_point(self, p, t):
        x, y = p[0], p[1]
        r = jnp.ones_like(x)
        pr = 10.0 + (jnp.cos(2 * jnp.pi * x) + jnp.cos(2 * jnp.pi * y)) / 4.0
        u = jnp.sin(jnp.pi * x) * jnp.cos(jnp.pi * y)
        v = -jnp.cos(jnp.pi * x) * jnp.sin(jnp.pi * y)
        w = jnp.zeros_like(x)
        rE = self.eos.totalenergy(r, u, v, w, pr)
        return jnp.stack([r, r * u, r * v, r * w, rE])

    def solinc(self, xyz, t, dt):
        return jnp.zeros((xyz.shape[0], 5), dtype=xyz.dtype)


@dataclasses.dataclass(frozen=True)
class SodShocktube(CompFlowProblem):
    """Sod shock tube ICs (SodShocktube.cpp:28-100; no analytic evolution:
    like the reference, `solution` returns the t=0 state)."""

    eos: StiffenedGas = StiffenedGas(gamma=1.4)

    def sol_point(self, p, t):
        x = p[0]
        left = x < 0.5
        r = jnp.where(left, 1.0, 0.125)
        pr = jnp.where(left, 1.0, 0.1)
        u = jnp.zeros_like(x)
        rE = self.eos.totalenergy(r, u, u, u, pr)
        z = jnp.zeros_like(x)
        return jnp.stack([r, z, z, z, rE])


@dataclasses.dataclass(frozen=True)
class RotatedSodShocktube(SodShocktube):
    """Sod shock tube rotated by (-45, -45, -45) degrees about X, Y, Z
    (RotatedSodShocktube.cpp: evaluate the unrotated problem in the rotated
    frame)."""

    def sol_point(self, p, t):
        # rotate the point back into the unrotated tube frame
        angles = (-jnp.pi / 4.0, -jnp.pi / 4.0, -jnp.pi / 4.0)
        cx, sx = np.cos(angles[0]), np.sin(angles[0])
        cy, sy = np.cos(angles[1]), np.sin(angles[1])
        cz, sz = np.cos(angles[2]), np.sin(angles[2])
        Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=p.dtype)
        Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=p.dtype)
        Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=p.dtype)
        q = Rx @ (Ry @ (Rz @ p))
        return SodShocktube.sol_point(self, q, t)


@dataclasses.dataclass(frozen=True)
class SedovBlastwave(CompFlowProblem):
    """Sedov blast wave ICs: high-pressure corner cell (SedovBlastwave.cpp:
    28-100).  p1 is the source-region pressure (783.4112 in the reference's
    quadrant setup)."""

    p1: float = 783.4112
    p0: float = 1.0e-6
    rcorner: float = 0.05
    eos: StiffenedGas = StiffenedGas(gamma=1.4)

    def sol_point(self, p, t):
        x, y = p[0], p[1]
        hot = (x < self.rcorner) & (y < self.rcorner)
        r = jnp.ones_like(x)
        pr = jnp.where(hot, self.p1, self.p0)
        u = jnp.zeros_like(x)
        rE = self.eos.totalenergy(r, u, u, u, pr)
        z = jnp.zeros_like(x)
        return jnp.stack([r, z, z, z, rE])


@dataclasses.dataclass(frozen=True)
class NLEnergyGrowth(CompFlowProblem):
    """Nonlinear energy growth manufactured solution (NLEnergyGrowth.cpp:
    25-190).  Deck defaults from the reference regression
    (.../NLEnergyGrowth/nleg.q)."""

    alpha: float = 0.25
    betax: float = 1.0
    betay: float = 0.75
    betaz: float = 0.5
    r0: float = 2.0
    ce: float = -1.0
    kappa: float = 0.8
    eos: StiffenedGas = StiffenedGas(gamma=5.0 / 3.0)
    manufactured: bool = True

    def sol_point(self, p, t):
        x, y, z = p[0], p[1], p[2]
        gx = 1.0 - x * x - y * y - z * z
        h = (
            jnp.cos(self.betax * jnp.pi * x)
            * jnp.cos(self.betay * jnp.pi * y)
            * jnp.cos(self.betaz * jnp.pi * z)
        )
        ft = jnp.exp(-self.alpha * t)
        r = self.r0 + ft * gx
        ec = (-3.0 * (self.ce + self.kappa * h * h * t)) ** (-1.0 / 3.0)
        zero = jnp.zeros_like(x)
        return jnp.stack([r, zero, zero, zero, r * ec])


@dataclasses.dataclass(frozen=True)
class RayleighTaylor(CompFlowProblem):
    """Time-dependent Rayleigh-Taylor manufactured solution
    (RayleighTaylor.cpp:28-200).  Deck defaults from the reference
    regression (.../RayleighTaylor/rayleigh_taylor.q)."""

    alpha: float = 1.0
    betax: float = 1.0
    betay: float = 1.0
    betaz: float = 1.0
    p0: float = 1.0
    r0: float = 1.0
    kappa: float = 1.0
    eos: StiffenedGas = StiffenedGas(gamma=5.0 / 3.0)
    manufactured: bool = True

    def sol_point(self, p, t):
        x, y, z = p[0], p[1], p[2]
        gx = self.betax * x * x + self.betay * y * y + self.betaz * z * z
        r = self.r0 - gx
        pr = self.p0 + self.alpha * gx
        ft = jnp.cos(self.kappa * jnp.pi * t)
        u = ft * z * jnp.sin(jnp.pi * x)
        v = ft * z * jnp.cos(jnp.pi * y)
        w = ft * (-0.5 * jnp.pi * z * z * (jnp.cos(jnp.pi * x) - jnp.sin(jnp.pi * y)))
        rE = self.eos.totalenergy(r, u, v, w, pr)
        return jnp.stack([r, r * u, r * v, r * w, rE])


@dataclasses.dataclass(frozen=True)
class UserDefined(CompFlowProblem):
    """Quiescent user-defined ICs (UserDefined.cpp): unit density, zero
    velocity, unit specific total energy."""

    eos: StiffenedGas = StiffenedGas(gamma=1.4)

    def sol_point(self, p, t):
        one = jnp.ones_like(p[0])
        zero = jnp.zeros_like(p[0])
        return jnp.stack([one, zero, zero, zero, one])
