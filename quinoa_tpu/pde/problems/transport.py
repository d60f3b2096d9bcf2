"""Scalar-transport problem policies — component-major layout.

Vectorized jnp re-implementations of the reference problem policies
(src/PDE/Transport/Problem/{SlotCyl,GaussHump,CylAdvect,ShearDiff}.cpp).

LAYOUT CONTRACT: coordinates arrive as ``xyz`` of shape (3, n);

  solution(xyz, t)  -> (C, n)      initial/analytic solution
  velocity(xyz, t)  -> (C, 3, n)   prescribed advection velocity
  solinc(xyz, t, dt)-> (C, n)      Dirichlet-BC increment over [t, t+dt]
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


class TransportProblem:
    """Base: default solinc = solution(t+dt) - solution(t)."""

    ncomp: int = 1
    #: diffusivities per component, flattened (dx,dy,dz)*ncomp; empty = pure
    #: advection (the reference's CGAdvection physics).
    diffusivity: Tuple[float, ...] = ()

    def analytic(self, xyz, t):
        return self.solution(xyz, t)

    def solinc(self, xyz, t, dt):
        return self.solution(xyz, t + dt) - self.solution(xyz, t)


@dataclasses.dataclass
class SlotCyl(TransportProblem):
    """Zalesak slotted cylinder + cone + hump in solid-body rotation.

    Velocity v = (1/2 - y, x - 1/2, 0); each extra component is the same
    field phase-shifted by 2*pi/ncomp (reference SlotCyl.cpp:30-110).
    """

    ncomp: int = 1

    def velocity(self, xyz, t):
        v = jnp.stack([0.5 - xyz[1], xyz[0] - 0.5, jnp.zeros_like(xyz[0])])
        return jnp.broadcast_to(v[None], (self.ncomp,) + v.shape)

    def solution(self, xyz, t):
        x, y = xyz[0], xyz[1]
        outs = []
        R0 = 0.15
        for c in range(self.ncomp):
            T = t + 2.0 * np.pi / self.ncomp * c
            sinT, cosT = jnp.sin(T), jnp.cos(T)

            r_k = 0.25
            kx, ky = 0.5 + r_k * sinT, 0.5 - r_k * cosT
            hx = 0.5 + r_k * jnp.sin(T - np.pi / 2)
            hy = 0.5 - r_k * jnp.cos(T - np.pi / 2)
            cx = 0.5 + r_k * jnp.sin(T + np.pi)
            cy = 0.5 - r_k * jnp.cos(T + np.pi)

            s = jnp.zeros_like(x)

            r = jnp.sqrt((x - kx) ** 2 + (y - ky) ** 2) / R0
            s = jnp.where(r < 1.0, 0.6 * (1.0 - r), s)

            r = jnp.sqrt((x - hx) ** 2 + (y - hy) ** 2) / R0
            s = jnp.where(
                r < 1.0, 0.2 * (1.0 + jnp.cos(np.pi * jnp.minimum(r, 1.0))), s
            )

            r = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2) / R0

            i1 = (0.525, 0.75 - r_k * np.cos(np.arcsin(0.025 / r_k)))
            i2 = (0.525, 0.8)
            i3 = (0.475, 0.8)

            def rot(p):
                px = 0.5 + cosT * (p[0] - 0.5) - sinT * (p[1] - 0.5)
                py = 0.5 + sinT * (p[0] - 0.5) + cosT * (p[1] - 0.5)
                return px, py

            r1x, r1y = rot(i1)
            r2x, r2y = rot(i2)
            r3x, r3y = rot(i3)

            v1x, v1y = r2x - r1x, r2y - r1y
            v2x, v2y = r3x - r2x, r3y - r2y
            v1 = jnp.sqrt(v1x**2 + v1y**2)
            v2 = jnp.sqrt(v2x**2 + v2y**2)

            d1 = (v1x * (x - r1x) + v1y * (y - r1y)) / v1
            d2 = (v2x * (x - r2x) + v2y * (y - r2y)) / v2

            in_slot = (d1 > 0.0) & (d1 < v1) & (d2 > 0.0) & (d2 < v2)
            s = jnp.where((r < 1.0) & ~in_slot, 0.6, s)
            outs.append(s)
        return jnp.stack(outs)


@dataclasses.dataclass
class GaussHump(TransportProblem):
    """Gaussian hump advected by constant velocity (0.1, 0.1, 0)."""

    ncomp: int = 1

    def velocity(self, xyz, t):
        sh = xyz.shape[1:]
        v = jnp.stack(
            [jnp.full(sh, 0.1, xyz.dtype),
             jnp.full(sh, 0.1, xyz.dtype),
             jnp.zeros(sh, xyz.dtype)]
        )
        return jnp.broadcast_to(v[None], (self.ncomp,) + v.shape)

    def solution(self, xyz, t):
        x, y = xyz[0], xyz[1]
        x0 = 0.25 + 0.1 * t
        y0 = 0.25 + 0.1 * t
        s = jnp.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2.0 * 0.005))
        return jnp.broadcast_to(s[None], (self.ncomp,) + s.shape)


@dataclasses.dataclass
class CylAdvect(TransportProblem):
    """Cylinder (square wave, r<0.2) advected by (0.1, 0.1, 0)."""

    ncomp: int = 1

    def velocity(self, xyz, t):
        sh = xyz.shape[1:]
        v = jnp.stack(
            [jnp.full(sh, 0.1, xyz.dtype),
             jnp.full(sh, 0.1, xyz.dtype),
             jnp.zeros(sh, xyz.dtype)]
        )
        return jnp.broadcast_to(v[None], (self.ncomp,) + v.shape)

    def solution(self, xyz, t):
        x, y = xyz[0], xyz[1]
        x0 = 0.25 + 0.1 * t
        y0 = 0.25 + 0.1 * t
        r = jnp.sqrt((x - x0) ** 2 + (y - y0) ** 2)
        s = jnp.where(r < 0.2, 1.0, 0.0).astype(xyz.dtype)
        return jnp.broadcast_to(s[None], (self.ncomp,) + s.shape)


@dataclasses.dataclass
class ShearDiff(TransportProblem):
    """Advection-diffusion of a point source in a 3-D shear flow
    (Carter & Okubo; reference ShearDiff.cpp:30-67).  Requires positive
    diffusivities and t0 > 0."""

    ncomp: int = 1
    u0: Tuple[float, ...] = (0.5,)
    lam: Tuple[float, ...] = (1.0, 0.0)
    diffusivity: Tuple[float, ...] = (1e-3, 5e-4, 5e-4)

    def velocity(self, xyz, t):
        vels = []
        for c in range(self.ncomp):
            l0, l1 = self.lam[2 * c], self.lam[2 * c + 1]
            vx = self.u0[c] + l0 * xyz[1] + l1 * xyz[2]
            vels.append(jnp.stack([vx, jnp.zeros_like(vx), jnp.zeros_like(vx)]))
        return jnp.stack(vels)

    def solution(self, xyz, t):
        x, y, z = xyz[0], xyz[1], xyz[2]
        outs = []
        for c in range(self.ncomp):
            l0, l1 = self.lam[2 * c], self.lam[2 * c + 1]
            d0, d1, d2 = self.diffusivity[3 * c : 3 * c + 3]
            phi3s = (l0 * l0 * d1 / d0 + l1 * l1 * d2 / d0) / 12.0
            pre = 1.0 / (
                8.0 * np.pi**1.5 * jnp.sqrt(d0 * d1 * d2) * t**1.5
                * jnp.sqrt(1.0 + phi3s * t * t)
            )
            arg = (
                -((x - self.u0[c] * t - 0.5 * (l0 * y + l1 * z) * t) ** 2)
                / (4.0 * d0 * t * (1.0 + phi3s * t * t))
                - y * y / (4.0 * d1 * t)
                - z * z / (4.0 * d2 * t)
            )
            outs.append(pre * jnp.exp(arg))
        return jnp.stack(outs)
