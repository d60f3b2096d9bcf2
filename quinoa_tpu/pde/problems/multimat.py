"""Multi-material problem policies (InterfaceAdvection, SodShocktube).

Component-major re-implementations of src/PDE/MultiMat/Problem/
{InterfaceAdvection,SodShocktube}.cpp with the MultiMatIndexing layout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..eos import StiffenedGas
from ..multimat import volfrac_idx, density_idx, momentum_idx, energy_idx

ALPHAMIN = 1.0e-12


@dataclasses.dataclass(frozen=True)
class MMInterfaceAdvection:
    """Concentric material rings advected diagonally at |v|=10
    (InterfaceAdvection.cpp:36-105); densities from the ideal-gas
    p=1e5, T=300 state per material."""

    nmat: int = 3
    eos: Tuple[StiffenedGas, ...] = (
        StiffenedGas(gamma=1.4, cv=83.33),
        StiffenedGas(gamma=1.4, cv=717.5),
        StiffenedGas(gamma=1.4, cv=717.5),
    )

    def solution(self, xyz, t):
        nmat = self.nmat
        x, y = xyz[0], xyz[1]
        u = v = np.sqrt(50.0)
        w = 0.0
        x0, y0 = 0.45 + u * t, 0.45 + v * t

        r0 = [0.0] * nmat
        r0[nmat - 1] = 0.0
        r0[nmat - 2] = 0.1
        r0[0] = 0.35
        for k in range(1, nmat - 2):
            r0[k] = r0[k - 1] - (r0[0] - r0[nmat - 2]) / max(1.0, nmat - 2)

        r = jnp.sqrt((x - x0) ** 2 + (y - y0) ** 2)
        alpha = [jnp.full_like(x, ALPHAMIN) for _ in range(nmat)]
        big = 1.0 - (nmat - 1) * ALPHAMIN
        assigned = jnp.zeros_like(x, dtype=bool)
        for k in range(nmat - 1):
            m = (r < r0[k]) & (r >= r0[k + 1])
            alpha[k] = jnp.where(m, big, alpha[k])
            assigned = assigned | m
        alpha[nmat - 1] = jnp.where(~assigned, big, alpha[nmat - 1])

        s = [None] * (3 * nmat + 3)
        rhob = jnp.zeros_like(x)
        for k in range(nmat):
            rhok = self.eos[k].density(1.0e5, 300.0)
            s[volfrac_idx(nmat, k)] = alpha[k]
            s[density_idx(nmat, k)] = alpha[k] * rhok
            s[energy_idx(nmat, k)] = alpha[k] * self.eos[k].totalenergy(
                rhok, u, v, w, 1.0e5
            )
            rhob = rhob + s[density_idx(nmat, k)]
        s[momentum_idx(nmat, 0)] = rhob * u
        s[momentum_idx(nmat, 1)] = rhob * v
        s[momentum_idx(nmat, 2)] = rhob * w
        return jnp.stack(s)


@dataclasses.dataclass(frozen=True)
class MMSmoothWave:
    """Smooth multi-material density waves advected by a uniform flow.

    With constant pressure, velocity, and volume fractions, the
    velocity-equilibrium system reduces to pure advection of the
    material densities (the stiffened-gas internal energy density
    (p + gamma p_inf)/(gamma - 1) is density-independent, so material
    energies advect too): an exact solution that is smooth, exercises
    every conservative flux column, and makes the non-conservative
    terms analytically zero — the convergence-order anchor for the
    beyond-parity DG(P1) multimat path (no analog in the reference
    fork: DGMultiMat.hpp:154 asserts ndof==1)."""

    nmat: int = 2
    eos: Tuple[StiffenedGas, ...] = (
        StiffenedGas(gamma=1.4),
        StiffenedGas(gamma=1.6),
    )
    vel: Tuple[float, float, float] = (1.0, 0.5, 0.0)
    p0: float = 2.0

    def solution(self, xyz, t):
        nmat = self.nmat
        x, y = xyz[0], xyz[1]
        u, v, w = self.vel
        xi = x - u * t
        eta = y - v * t
        two_pi = 2.0 * np.pi
        alpha = [jnp.full_like(x, 1.0 / nmat) for _ in range(nmat)]
        s = [None] * (3 * nmat + 3)
        rhob = jnp.zeros_like(x)
        for k in range(nmat):
            rk = (1.0 + 0.5 * k
                  + 0.2 * jnp.sin(two_pi * xi) * jnp.cos(two_pi * eta))
            s[volfrac_idx(nmat, k)] = alpha[k]
            s[density_idx(nmat, k)] = alpha[k] * rk
            s[energy_idx(nmat, k)] = alpha[k] * self.eos[k].totalenergy(
                rk, u, v, w, self.p0)
            rhob = rhob + s[density_idx(nmat, k)]
        s[momentum_idx(nmat, 0)] = rhob * u
        s[momentum_idx(nmat, 1)] = rhob * v
        s[momentum_idx(nmat, 2)] = rhob * w
        return jnp.stack(s)


@dataclasses.dataclass(frozen=True)
class MMSodShocktube:
    """Two-material Sod shock tube (MultiMat SodShocktube.cpp): material 0
    fills the left state, material 1 the right, alphamin elsewhere."""

    nmat: int = 2
    eos: Tuple[StiffenedGas, ...] = (
        StiffenedGas(gamma=1.4),
        StiffenedGas(gamma=1.4),
    )

    def solution(self, xyz, t):
        nmat = self.nmat
        x = xyz[0]
        left = x < 0.5
        big = 1.0 - (nmat - 1) * ALPHAMIN

        a0 = jnp.where(left, big, ALPHAMIN)
        a1 = jnp.where(left, ALPHAMIN, big)
        r = jnp.where(left, 1.0, 0.125).astype(x.dtype)
        p = jnp.where(left, 1.0, 0.1).astype(x.dtype)
        zero = jnp.zeros_like(x)

        s = [None] * (3 * nmat + 3)
        s[volfrac_idx(nmat, 0)] = a0
        s[volfrac_idx(nmat, 1)] = a1
        # both materials carry the local (rho, p) state
        for k, a in ((0, a0), (1, a1)):
            s[density_idx(nmat, k)] = a * r
            s[energy_idx(nmat, k)] = a * self.eos[k].totalenergy(
                r, zero, zero, zero, p
            )
        s[momentum_idx(nmat, 0)] = zero
        s[momentum_idx(nmat, 1)] = zero
        s[momentum_idx(nmat, 2)] = zero
        return jnp.stack(s)
