"""Overdecomposition: multiple mesh chunks per device (virtualization).

The reference's single biggest published perf lever is Charm++
overdecomposition — more chares than PEs, sized by
tk::linearLoadDistributor's virtualization parameter u in [0,1]
(LoadDistributor.cpp:23-90, doc/pages/inciter_performance.dox:21-62).
The TPU analog:

- `linear_load_distributor(u, nelem, npes)` picks the chunk count,
  rounded up to a multiple of npes so every device hosts the same
  number of chunks;
- the partitioner cuts nchunk = cpd*npes pieces; chunks are assigned to
  devices by LPT (longest-processing-time greedy) over their REAL
  element counts — the load-balance role Charm++ chare placement and
  migration play;
- each device's cpd chunks are then MERGED along the node/element axes
  into one super-shard (long trailing axes, exactly what the TPU wants;
  no nested collectives), so the existing SPMD solvers run unchanged.
  A boundary node shared by two chunks of the same device appears as
  two local copies, so the boundary-buffer gather table becomes
  multi-copy: rev_slot (m, nb+1) with the combiner folding the m copies
  elementwise before the cross-device psum/pmax/pmin.

Smaller chunks give the assignment finer granularity: after AMR the
per-chunk loads diverge, and rebuilding only the chunk->device
assignment rebalances without repartitioning the mesh.  The chunk
bookkeeping (assign, per-chunk slices) is kept in OverdecomposedCG.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base.load import linear_load_distributor
from ..pde.cg import CGGeom
from .shard import ShardedCG, build_cg_shards


def lpt_assign(costs: np.ndarray, npes: int, cpd: int) -> np.ndarray:
    """Longest-processing-time greedy: chunks (sorted by cost desc) go to
    the least-loaded device that still has capacity (cpd chunks each).
    Returns (npes, cpd) chunk ids."""
    nchunk = len(costs)
    assert nchunk == npes * cpd
    order = np.argsort(-np.asarray(costs), kind="stable")
    load = np.zeros(npes)
    fill = np.zeros(npes, dtype=np.int64)
    out = np.full((npes, cpd), -1, dtype=np.int64)
    for c in order:
        open_ = np.nonzero(fill < cpd)[0]
        d = open_[np.argmin(load[open_])]
        out[d, fill[d]] = c
        fill[d] += 1
        load[d] += costs[c]
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["sharded"],
    meta_fields=["npes", "cpd", "assign"],
)
@dataclasses.dataclass(frozen=True)
class OverdecomposedCG:
    """A merged ShardedCG (nshard=npes, multi-copy rev_slot) plus the
    chunk bookkeeping needed to rebalance by reassignment."""

    sharded: ShardedCG
    npes: int
    cpd: int
    assign: tuple  # (npes, cpd) chunk ids as tuple-of-tuples


def build_overdecomposed_cg(
    mesh,
    npes: int,
    virtualization: float,
    ncomp: int,
    bcnodes: Optional[np.ndarray] = None,
    algorithm: str = "sfc",
    dtype=None,
) -> OverdecomposedCG:
    """Partition into linear_load_distributor-many chunks, LPT-assign
    them to devices, and merge each device's chunks into a super-shard
    the unchanged SPMD solvers can run."""
    _, nchare = linear_load_distributor(virtualization, mesh.nelem, npes)
    cpd = max(math.ceil(nchare / npes), 1)
    nchunk = cpd * npes
    base = build_cg_shards(
        mesh, nchunk, ncomp, bcnodes=bcnodes, algorithm=algorithm,
        dtype=dtype,
    )
    costs = np.asarray(base.geom.emask).sum(axis=1)
    assign = lpt_assign(costs, npes, cpd)
    perm = assign.reshape(-1)

    g = base.geom
    Nl = int(np.asarray(g.vol).shape[1])
    Emax = int(np.asarray(g.emask).shape[1])
    D = int(np.asarray(g.nsup).shape[1])
    nb = base.nb

    def grp(a):
        """(nchunk, ...) -> (npes, cpd, ...) in assignment order."""
        return np.asarray(a)[perm].reshape((npes, cpd) + a.shape[1:])

    coords = grp(g.coords)          # (npes, cpd, 3, Nl)
    inpoelT = grp(g.inpoelT)        # (npes, cpd, 4, Emax)
    J = grp(g.J)
    grad = grp(g.grad)              # (npes, cpd, 4, 3, Emax)
    vol = grp(g.vol)
    emask = grp(g.emask)
    nsup = grp(g.nsup)              # (npes, cpd, D, Nl)
    slot = grp(base.bnd_slot)       # (npes, cpd, Nl)
    owned = grp(base.owned)
    bcmask = grp(base.bcmask)       # (npes, cpd, C, Nl)
    gids = grp(base.gids)

    NlM, EM = cpd * Nl, cpd * Emax
    coff = (np.arange(cpd) * Nl)[None, :, None, None]
    inpoelT_m = (inpoelT + coff).transpose(0, 2, 1, 3).reshape(npes, 4, EM)

    # nsup values index the chunk's (4*Emax) gather-slot space
    # (a*Emax + e, pad = 4*Emax); remap into the merged (4*EM) space:
    # a*EM + c*Emax + e, pad -> 4*EM
    a_idx = nsup // Emax
    e_idx = nsup % Emax
    valid = nsup < 4 * Emax
    ch = (np.arange(cpd) * Emax)[None, :, None, None]
    nsup_m = np.where(valid, a_idx * EM + ch + e_idx, 4 * EM)
    nsup_m = nsup_m.transpose(0, 2, 1, 3).reshape(npes, D, NlM)

    slot_m = slot.reshape(npes, NlM)
    # multi-copy reverse table: each boundary slot's local positions
    rev_lists = [[[] for _ in range(nb)] for _ in range(npes)]
    for d in range(npes):
        on = np.nonzero(slot_m[d] < nb)[0]
        for p in on:
            rev_lists[d][slot_m[d][p]].append(p)
    m = max(
        (len(v) for dev in rev_lists for v in dev), default=1
    )
    rev_m = np.full((npes, m, nb + 1), NlM, dtype=np.int32)
    for d in range(npes):
        for s, v in enumerate(rev_lists[d]):
            rev_m[d, : len(v), s] = v

    geom = CGGeom(
        coords=jnp.asarray(
            coords.transpose(0, 2, 1, 3).reshape(npes, 3, NlM),
            dtype=g.coords.dtype),
        inpoelT=jnp.asarray(inpoelT_m),
        J=jnp.asarray(J.reshape(npes, EM), dtype=g.J.dtype),
        grad=jnp.asarray(
            grad.transpose(0, 2, 3, 1, 4).reshape(npes, 4, 3, EM),
            dtype=g.grad.dtype),
        vol=jnp.asarray(vol.reshape(npes, NlM), dtype=g.vol.dtype),
        emask=jnp.asarray(emask.reshape(npes, EM), dtype=g.emask.dtype),
        nsup=jnp.asarray(nsup_m),
        nnode=NlM,
    )
    merged = ShardedCG(
        geom=geom,
        bnd_slot=jnp.asarray(slot_m),
        rev_slot=jnp.asarray(rev_m),
        owned=jnp.asarray(owned.reshape(npes, NlM), dtype=g.vol.dtype),
        bcmask=jnp.asarray(
            bcmask.transpose(0, 2, 1, 3).reshape(npes, ncomp, NlM),
            dtype=g.vol.dtype),
        gids=jnp.asarray(gids.reshape(npes, NlM)),
        nhalo=None,  # multi-copy combine goes through the slot buffer
        nshard=npes,
        nb=nb,
        nnode_global=base.nnode_global,
        nelem_global=base.nelem_global,
    )
    return OverdecomposedCG(
        sharded=merged, npes=npes, cpd=cpd,
        assign=tuple(map(tuple, assign.tolist())),
    )
