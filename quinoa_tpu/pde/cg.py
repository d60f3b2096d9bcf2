"""Continuous-Galerkin spatial operators over dense element tables.

The device-side data structure and the CGPDE operator protocol.  Counterpart
of the reference's CGPDE interface (src/PDE/CGPDE.hpp:43-130) and its
Transport implementation (src/PDE/Transport/CGTransport.hpp), re-designed as
pure functions over a static-geometry pytree:

- geometry (Jacobians, P1 shape-function gradients, nodal volumes) is
  precomputed host-side once per (re)partition and stored as [E,...] tables;
- per-element gathers/scatters are two XLA segment ops (quinoa_tpu.ops);
- padded elements are handled with an element mask so all shapes are static.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.geometry import tet_geometry, nodal_volumes
from ..ops.scatter import gather_nodes, scatter_add_nodes


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["coords", "inpoel", "J", "grad", "vol", "emask"],
    meta_fields=["nnode"],
)
@dataclasses.dataclass(frozen=True)
class CGGeom:
    """Static per-shard geometry tables for node-centered (CG) solvers.

    Attributes
    ----------
    coords : (nnode, 3)      node coordinates
    inpoel : (nelem, 4) i32  element connectivity (local node ids)
    J      : (nelem,)        element Jacobian = 6*volume (1.0 for padding)
    grad   : (nelem, 4, 3)   P1 shape-function gradients (0 for padding)
    vol    : (nnode,)        nodal volumes, *fully summed* across shards
    emask  : (nelem,)        1.0 for real elements, 0.0 for padding
    nnode  : int             static node count (needed by segment ops)
    """

    coords: jnp.ndarray
    inpoel: jnp.ndarray
    J: jnp.ndarray
    grad: jnp.ndarray
    vol: jnp.ndarray
    emask: jnp.ndarray
    nnode: int

    @property
    def nelem(self) -> int:
        return self.inpoel.shape[0]


def make_cggeom(mesh, dtype=None) -> CGGeom:
    """Build single-shard CGGeom from a host UnsMesh (no padding).

    dtype defaults to JAX's current default float dtype (f64 with x64
    enabled — matching the reference's tk::real — else f32, the TPU
    performance dtype).  Geometry is always derived in f64 on host.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    J, grad = tet_geometry(mesh.coords, mesh.inpoel)
    if not (J > 0).all():
        raise ValueError("mesh has non-positive element Jacobians")
    vol = nodal_volumes(mesh.coords, mesh.inpoel, mesh.nnode)
    return CGGeom(
        coords=jnp.asarray(mesh.coords, dtype=dtype),
        inpoel=jnp.asarray(mesh.inpoel, dtype=jnp.int32),
        J=jnp.asarray(J, dtype=dtype),
        grad=jnp.asarray(grad, dtype=dtype),
        vol=jnp.asarray(vol, dtype=dtype),
        emask=jnp.ones(mesh.nelem, dtype=dtype),
        nnode=int(mesh.nnode),
    )


def lumped_mass(geom: CGGeom) -> jnp.ndarray:
    """Assembled lumped mass 'matrix' diagonal: (nnode,).

    Each element contributes V/4 = J/24 to each of its four nodes
    (reference: FluxCorrector::lump, src/Inciter/FluxCorrector.cpp:238-280).
    NOTE: per-shard partial sums; combine over shards on chare-boundary nodes.
    """
    w = (geom.J * geom.emask) / 24.0
    contrib = jnp.broadcast_to(w[:, None, None], (geom.nelem, 4, 1))
    return scatter_add_nodes(contrib, geom.inpoel, geom.nnode)[:, 0]


class CGTransport:
    """Scalar advection(-diffusion) with the two-stage Taylor-Galerkin scheme.

    Semantics match the reference CGTransport (src/PDE/Transport/
    CGTransport.hpp:183-330 rhs, 331-395 dt): stage 1 forms element-centered
    intermediates Ue at t+dt/2 from nodal values and prescribed velocities at
    the nodes; stage 2 scatter-adds element fluxes (velocity at the element
    center) back to nodes.  Optional isotropic-tensor diffusion follows
    CGAdvDiff (src/PDE/Transport/Physics/CGAdvDiff.cpp:30-96).
    """

    def __init__(self, problem, ncomp: Optional[int] = None):
        self.problem = problem
        self.ncomp = ncomp if ncomp is not None else problem.ncomp
        d = getattr(problem, "diffusivity", ()) or ()
        self.diffusivity = np.asarray(d, dtype=np.float64).reshape(-1, 3) if len(d) else None

    # -- CGPDE protocol -----------------------------------------------------

    def initialize(self, xyz, t):
        return self.problem.solution(xyz, t)

    def analytic(self, xyz, t):
        return self.problem.solution(xyz, t)

    def solinc(self, xyz, t, dt):
        return self.problem.solinc(xyz, t, dt)

    def rhs(self, t, dt, geom: CGGeom, U):
        """Right-hand side, shape (nnode, ncomp): per-shard partial sums."""
        x = geom.coords
        un = gather_nodes(U, geom.inpoel)  # (E,4,C)

        # stage 1: element intermediate at t+dt/2
        xyz_n = x[geom.inpoel].reshape(-1, 3)  # (E*4,3)
        vel_n = self.problem.velocity(xyz_n, t).reshape(
            geom.nelem, 4, self.ncomp, 3
        )
        # advective term: sum_a grad[a]·v[a,c] * u[a,c]
        adv = jnp.einsum("eaj,eacj,eac->ec", geom.grad, vel_n, un)
        ue = un.mean(axis=1) - 0.5 * dt * adv  # (E,C)

        # stage 2: scatter element fluxes to nodes with center velocity
        ctr = x[geom.inpoel].mean(axis=1)  # (E,3)
        vel_c = self.problem.velocity(ctr, t)  # (E,C,3)
        d = dt * geom.J * geom.emask / 6.0  # (E,)
        contrib = d[:, None, None] * jnp.einsum(
            "eaj,ecj,ec->eac", geom.grad, vel_c, ue
        )

        if self.diffusivity is not None:
            # R_a -= dt*J/6 * D_k * grad[a,k] grad[b,k] u[b]  (AdvDiff physics)
            D = jnp.asarray(self.diffusivity, dtype=U.dtype)  # (C,3)
            diff = jnp.einsum(
                "eak,ck,ebk,ebc->eac", geom.grad, D, geom.grad, un
            )
            contrib = contrib - d[:, None, None] * diff

        return scatter_add_nodes(contrib, geom.inpoel, geom.nnode)

    def dt(self, geom: CGGeom, U):
        """Minimum time-step over local elements (before CFL scaling)."""
        L = jnp.cbrt(geom.J / 6.0)
        xyz_n = geom.coords[geom.inpoel].reshape(-1, 3)
        vel_n = self.problem.velocity(xyz_n, 0.0).reshape(
            geom.nelem, 4, self.ncomp, 3
        )
        speed = jnp.sqrt((vel_n**2).sum(-1))  # (E,4,C)
        maxvel = speed.max(axis=(1, 2))
        adv_dt = L / jnp.maximum(maxvel, 1e-300)
        if self.diffusivity is not None:
            # dt ~ dx^2/(2D) with the largest diffusivity across components
            dmax = float(self.diffusivity.max())
            dif_dt = L * L / (2.0 * dmax)
            elemdt = jnp.minimum(adv_dt, dif_dt)
        else:
            elemdt = adv_dt
        big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
        return jnp.where(geom.emask > 0, elemdt, big).min()
