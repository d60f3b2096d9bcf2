"""SPMD DiagCG solver: one XLA program over a jax.sharding.Mesh.

The distributed counterpart of quinoa_tpu.inciter.DiagCGSolver: the same
step kernel (inciter.diagcg.diagcg_advance) is wrapped in `shard_map` over
a 1-D device mesh, and the three node-buffer combine hooks become

    scatter(local partials -> global boundary buffer)
      -> psum / pmax / pmin over the shard axis  (rides ICI)
      -> gather(buffer -> local boundary nodes)

replacing the reference's DistFCT/DiagCG per-neighbor point-to-point
messages (comrhs/comaec/comalw/comlim) and its custom reducers; dt is a
`pmin`, diagnostics are `psum`/`pmax` with node-ownership masks
(SURVEY.md §5.8 mapping).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fct.fct import FCT
from ..inciter.diagcg import CGState, diagcg_advance
from ..pde.cg import CGGeom
from .shard import ShardedCG

AXIS = "shard"


def _local(tree):
    """Strip the leading length-1 block axis shard_map leaves on inputs."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


class HaloCombiner:
    """Boundary-node buffer combines over the shard axis."""

    def __init__(self, bnd_slot: jnp.ndarray, nb: int):
        self.slot = bnd_slot  # (Nl,) int32; == nb for non-boundary nodes
        self.nb = nb
        self.is_bnd = (bnd_slot < nb)[:, None]

    def _combine(self, x, fill, reduce_op, node_op):
        if self.nb == 0:
            return x
        # scatter local partials into the boundary buffer (+1 trash row)
        buf = jnp.full((self.nb + 1, x.shape[-1]), fill, dtype=x.dtype)
        buf = node_op(buf.at[self.slot], x)
        buf = reduce_op(buf, AXIS)
        g = buf[self.slot]  # trash row read back for interior nodes
        return jnp.where(self.is_bnd, g, x)

    def sum(self, x):
        return self._combine(x, 0.0, jax.lax.psum, lambda ref, v: ref.add(v))

    def max(self, x):
        big = jnp.finfo(x.dtype).max
        return self._combine(x, -big, jax.lax.pmax, lambda ref, v: ref.max(v))

    def min(self, x):
        big = jnp.finfo(x.dtype).max
        return self._combine(x, big, jax.lax.pmin, lambda ref, v: ref.min(v))


class SPMDDiagCGSolver:
    """DiagCG+FCT over a 1-D device mesh via shard_map.

    Parameters mirror DiagCGSolver; `sharded` comes from build_cg_shards and
    `mesh` is a jax.sharding.Mesh with a single axis named 'shard' whose
    size equals sharded.nshard.
    """

    def __init__(
        self,
        system,
        sharded: ShardedCG,
        mesh: Mesh,
        cfl: float = 0.5,
        const_dt: Optional[float] = None,
        ctau: float = 1.0,
        fct: bool = True,
    ):
        if mesh.shape[AXIS] != sharded.nshard:
            raise ValueError(
                f"device mesh axis '{AXIS}' has {mesh.shape[AXIS]} devices, "
                f"but data is built for {sharded.nshard} shards"
            )
        self.system = system
        self.sharded = sharded
        self.mesh = mesh
        self.cfl = cfl
        self.const_dt = const_dt
        self.fct = FCT(ctau=ctau)
        self.use_fct = fct

        # lumped-mass lhs == fully-assembled nodal volume (see DiagCG::lhs +
        # lhsmerge; both equal sum_e J_e/24 over elements around the node)
        self.lhs = sharded.geom.vol

        # state: u sharded over the mesh axis, scalars replicated;
        # all static tables: sharded on their leading (shard) axis.
        spec_state = CGState(u=P(AXIS), t=P(), it=P(), dt=P())

        step = jax.shard_map(
            self._step_local,
            mesh=self.mesh,
            in_specs=(P(AXIS), P(AXIS), spec_state),
            out_specs=spec_state,
        )
        self._step = jax.jit(lambda st: step(self.sharded, self.lhs, st))

        diag = jax.shard_map(
            self._diag_local,
            mesh=self.mesh,
            in_specs=(P(AXIS), spec_state),
            out_specs=(P(), P(), P()),
        )
        self._diag = jax.jit(lambda st: diag(self.sharded, st))

    # -- per-shard bodies ---------------------------------------------------

    def _step_local(self, sharded, lhs, state):
        sh: ShardedCG = _local(sharded)
        geom = sh.geom
        lhs_l = _local(lhs)
        u = state.u[0]

        halo = HaloCombiner(sh.bnd_slot, self.sharded.nb)

        # dt: local min then global min (CkReduction::min_double analog)
        if self.const_dt is not None:
            dt = jnp.asarray(self.const_dt, dtype=u.dtype)
        else:
            dt = jax.lax.pmin(self.system.dt(geom, u) * self.cfl, AXIS)

        unew = diagcg_advance(
            self.system,
            self.fct,
            self.use_fct,
            geom,
            lhs_l,
            sh.bcmask,
            u,
            state.t,
            dt,
            combine_sum=halo.sum,
            combine_max=halo.max,
            combine_min=halo.min,
        )
        return CGState(
            u=unew[None], t=state.t + dt, it=state.it + 1, dt=dt
        )

    def _diag_local(self, sharded, state):
        """L2(sol), L2(err), Linf(err) with ownership-masked reductions."""
        sh: ShardedCG = _local(sharded)
        u = state.u[0]
        w = (sh.geom.vol * sh.owned)[:, None]
        vol_tot = jax.lax.psum((sh.geom.vol * sh.owned).sum(), AXIS)
        l2sol = jnp.sqrt(jax.lax.psum((u * u * w).sum(0), AXIS) / vol_tot)
        a = self.system.analytic(sh.geom.coords, state.t).astype(u.dtype)
        e = (u - a) * (sh.owned[:, None] > 0)
        l2err = jnp.sqrt(jax.lax.psum((e * e * w).sum(0), AXIS) / vol_tot)
        linferr = jax.lax.pmax(jnp.abs(e).max(0), AXIS)
        return l2sol, l2err, linferr

    # -- public API -----------------------------------------------------------

    def initial_state(self, t0: float = 0.0) -> CGState:
        dtype = self.sharded.geom.vol.dtype
        coords = self.sharded.geom.coords  # (S, Nl, 3)
        u0 = jax.vmap(lambda c: self.system.initialize(c, t0))(coords)
        u0 = jax.device_put(
            u0.astype(dtype),
            jax.sharding.NamedSharding(self.mesh, P(AXIS)),
        )
        return CGState(
            u=u0,
            t=jnp.asarray(t0, dtype=dtype),
            it=jnp.asarray(0, dtype=jnp.int32),
            dt=jnp.asarray(0.0, dtype=dtype),
        )

    def step(self, state: CGState) -> CGState:
        return self._step(state)

    def diagnostics(self, state: CGState):
        l2sol, l2err, linferr = self._diag(state)
        return (
            np.asarray(l2sol),
            np.asarray(l2err),
            np.asarray(linferr),
        )
