"""Shard construction: padded per-shard tables + halo metadata.

Replaces the reference's Partitioner distribute/categorize + Sorter global
reorder + Discretization comm-map (m_msum) machinery (src/Inciter/
Partitioner.cpp:344-542, Sorter.cpp:89-437, Discretization.hpp:31-361):
the host builds, once per (re)partition,

- per-shard local meshes (elements + the nodes they touch), all padded to
  identical shapes so a single SPMD program runs on every device;
- a *global boundary-node buffer* layout: every mesh node shared by >= 2
  shards gets one slot; per-shard `bnd_slot` maps local node -> slot (or a
  trash slot).  Cross-shard node combines then become
  scatter -> psum/pmax/pmin over the shard axis -> gather, replacing the
  reference's per-neighbor comrhs/comaec/... point-to-point messages;
- node ownership (lowest-sharing-shard convention, like the reference's
  lower-chare-ID rule in NodeDiagnostics.cpp:75-85) for reductions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.geometry import tet_geometry, nodal_volumes
from ..pde.cg import CGGeom
from .partition import partition_elements


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["geom", "bnd_slot", "owned", "bcmask", "gids"],
    meta_fields=["nshard", "nb", "nnode_global", "nelem_global"],
)
@dataclasses.dataclass(frozen=True)
class ShardedCG:
    """Stacked per-shard CG tables (leading axis = shard).

    geom     : CGGeom whose arrays all carry a leading [S] axis
    bnd_slot : (S, Nl) int32 — slot in the global boundary buffer, or `nb`
               (a trash slot) for nodes not on a shard boundary / padding
    owned    : (S, Nl) — 1.0 where this shard owns the node (for reductions)
    bcmask   : (S, Nl, ncomp) — 1.0 at Dirichlet-BC nodes
    gids     : (S, Nl) int32 — global node id of each local node (-1 padding)
    nb       : static int — number of distinct shard-boundary nodes
    """

    geom: CGGeom
    bnd_slot: jnp.ndarray
    owned: jnp.ndarray
    bcmask: jnp.ndarray
    gids: jnp.ndarray
    nshard: int
    nb: int
    nnode_global: int
    nelem_global: int


def build_cg_shards(
    mesh,
    nshard: int,
    ncomp: int,
    bcnodes: Optional[np.ndarray] = None,
    algorithm: str = "sfc",
    dtype=None,
) -> ShardedCG:
    """Partition a host mesh and build stacked, padded per-shard CG tables."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    coords, inpoel = mesh.coords, mesh.inpoel
    nnode, nelem = mesh.nnode, mesh.nelem

    # global geometry in f64 (vol must be the fully-assembled nodal volume)
    Jg, gradg = tet_geometry(coords, inpoel)
    if not (Jg > 0).all():
        raise ValueError("mesh has non-positive element Jacobians")
    volg = nodal_volumes(coords, inpoel, nnode)

    epart = partition_elements(coords, inpoel, nshard, algorithm)

    # per-shard element lists and touched-node lists
    elems = [np.nonzero(epart == s)[0] for s in range(nshard)]
    nodes = [np.unique(inpoel[e].ravel()) for e in elems]

    # nodes shared by >=2 shards -> boundary buffer slots (sorted by gid)
    counts = np.zeros(nnode, dtype=np.int32)
    owner = np.full(nnode, nshard, dtype=np.int32)
    for s in range(nshard - 1, -1, -1):
        counts[nodes[s]] += 1
        owner[nodes[s]] = s  # lowest sharing shard wins (reverse loop)
    bnd_gids = np.nonzero(counts >= 2)[0]
    nb = len(bnd_gids)
    slot_of = np.full(nnode, nb, dtype=np.int64)  # nb = trash slot
    slot_of[bnd_gids] = np.arange(nb)

    Emax = max(len(e) for e in elems)
    Nmax = max(len(n) for n in nodes)

    bcset = np.zeros(nnode, dtype=bool)
    if bcnodes is not None and len(bcnodes) > 0:
        bcset[np.asarray(bcnodes, dtype=np.int64)] = True

    S = nshard
    s_coords = np.zeros((S, Nmax, 3))
    s_inpoel = np.zeros((S, Emax, 4), dtype=np.int32)
    s_J = np.ones((S, Emax))
    s_grad = np.zeros((S, Emax, 4, 3))
    s_vol = np.ones((S, Nmax))
    s_emask = np.zeros((S, Emax))
    s_slot = np.full((S, Nmax), nb, dtype=np.int32)
    s_owned = np.zeros((S, Nmax))
    s_bcmask = np.zeros((S, Nmax, ncomp))
    s_gids = np.full((S, Nmax), -1, dtype=np.int32)

    for s in range(S):
        e, n = elems[s], nodes[s]
        ne, nn = len(e), len(n)
        g2l = np.full(nnode, -1, dtype=np.int64)
        g2l[n] = np.arange(nn)
        s_coords[s, :nn] = coords[n]
        s_inpoel[s, :ne] = g2l[inpoel[e]]
        s_J[s, :ne] = Jg[e]
        s_grad[s, :ne] = gradg[e]
        s_vol[s, :nn] = volg[n]  # fully-assembled nodal volume
        s_emask[s, :ne] = 1.0
        s_slot[s, :nn] = slot_of[n]
        s_owned[s, :nn] = (owner[n] == s).astype(np.float64)
        s_bcmask[s, :nn] = bcset[n, None].astype(np.float64)
        s_gids[s, :nn] = n
        # padded nodes: keep coords of node 0 to keep problem evals finite
        if nn < Nmax:
            s_coords[s, nn:] = coords[n[0]] if nn else 0.0

    geom = CGGeom(
        coords=jnp.asarray(s_coords, dtype=dtype),
        inpoel=jnp.asarray(s_inpoel),
        J=jnp.asarray(s_J, dtype=dtype),
        grad=jnp.asarray(s_grad, dtype=dtype),
        vol=jnp.asarray(s_vol, dtype=dtype),
        emask=jnp.asarray(s_emask, dtype=dtype),
        nnode=int(Nmax),
    )
    return ShardedCG(
        geom=geom,
        bnd_slot=jnp.asarray(s_slot),
        owned=jnp.asarray(s_owned, dtype=dtype),
        bcmask=jnp.asarray(s_bcmask, dtype=dtype),
        gids=jnp.asarray(s_gids),
        nshard=S,
        nb=nb,
        nnode_global=nnode,
        nelem_global=nelem,
    )


def gather_global_field(sharded: ShardedCG, u_stacked) -> np.ndarray:
    """Reassemble a global (nnode_global, ncomp) field from stacked shards.

    Each owned node contributes its value (host-side; used for field output,
    diagnostics cross-checks, and checkpointing).
    """
    u = np.asarray(u_stacked)
    gids = np.asarray(sharded.gids)
    owned = np.asarray(sharded.owned) > 0
    out = np.zeros((sharded.nnode_global, u.shape[-1]), dtype=u.dtype)
    for s in range(sharded.nshard):
        m = owned[s]
        out[gids[s][m]] = u[s][m]
    return out
