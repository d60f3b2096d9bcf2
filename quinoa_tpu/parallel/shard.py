"""Shard construction: padded per-shard tables + halo metadata.

Replaces the reference's Partitioner distribute/categorize + Sorter global
reorder + Discretization comm-map (m_msum) machinery (src/Inciter/
Partitioner.cpp:344-542, Sorter.cpp:89-437, Discretization.hpp:31-361):
the host builds, once per (re)partition,

- per-shard local meshes (elements + the nodes they touch), all padded to
  identical shapes so a single SPMD program runs on every device
  (feature-major layout: long axes last);
- a *global boundary-node buffer* layout: every mesh node shared by >= 2
  shards gets one slot; per-shard `bnd_slot` maps local node -> slot (or a
  trash slot).  Cross-shard node combines become
  gather -> psum/pmax/pmin over the shard axis -> gather-back, replacing
  the per-neighbor comrhs/comaec/... point-to-point messages;
- node ownership (lowest-sharing-shard, like the reference's
  lower-chare-ID rule in NodeDiagnostics.cpp:75-85) for reductions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.geometry import tet_geometry, nodal_volumes
from ..ops.assembly import build_nsup
from ..pde.cg import CGGeom
from .partition import partition_elements, partition_for


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send", "rpos"],
    meta_fields=["offsets", "Ls"],
)
@dataclasses.dataclass(frozen=True)
class NodeHalo:
    """Per-neighbor boundary-node exchange tables (the msum analog,
    src/Inciter/Discretization m_msum + DiagCG comrhs per-neighbor
    sends, DiagCG.cpp:309-321): one `lax.ppermute` round per occurring
    shard-id offset, exchange volume O(local boundary) per device —
    independent of the device count — instead of the global-buffer psum.

    send[k]  : (S, L_k) i32 — local node ids whose partials shard s
               sends to shard s+offsets[k] (pad Nl: gathers a zero/ignored
               column); sender and receiver order the shared nodes by
               global id, so slab position j on both sides is the same
               node
    rpos[k]  : (S, Nl) i32 — for each local node, its position in the
               slab received from shard s-offsets[k], or L_k (a fill
               column: 0 for sum, +-inf for min/max) when that neighbor
               contributes nothing to the node
    """

    send: Tuple
    rpos: Tuple
    offsets: Tuple
    Ls: Tuple


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["geom", "bnd_slot", "rev_slot", "owned", "bcmask", "gids",
                 "nhalo"],
    meta_fields=["nshard", "nb", "nnode_global", "nelem_global"],
)
@dataclasses.dataclass(frozen=True)
class ShardedCG:
    """Stacked per-shard CG tables (leading axis = shard).

    geom     : CGGeom whose arrays all carry a leading [S] axis
    bnd_slot : (S, Nl) i32 — slot in the global boundary buffer, or `nb`
               (a trash slot) for interior/padding nodes
    rev_slot : (S, nb+1) i32 — local node holding each boundary slot, or
               Nl (a trash column) when the slot's node is not on this
               shard (the gather-based inverse of bnd_slot)
    owned    : (S, Nl) — 1.0 where this shard owns the node
    bcmask   : (S, C, Nl) — 1.0 at Dirichlet-BC nodes
    gids     : (S, Nl) i32 — global node id of each local node (-1 pad)
    nhalo    : NodeHalo neighbor-exchange tables (None -> solvers fall
               back to the global-buffer combine)
    nb       : static int — number of distinct shard-boundary nodes
    """

    geom: CGGeom
    bnd_slot: jnp.ndarray
    rev_slot: jnp.ndarray
    owned: jnp.ndarray
    bcmask: jnp.ndarray
    gids: jnp.ndarray
    nhalo: Optional["NodeHalo"]
    nshard: int
    nb: int
    nnode_global: int
    nelem_global: int


def build_node_halo(nodes, nnode: int, Nl: int) -> Optional[NodeHalo]:
    """Neighbor-exchange tables from per-shard global-node-id lists.

    nodes[s] is the sorted array of global node ids on shard s; Nl the
    padded local node count.  Returns None for a single shard.
    """
    S = len(nodes)
    if S < 2:
        return None
    g2l = []
    for s in range(S):
        m = np.full(nnode, -1, dtype=np.int64)
        m[nodes[s]] = np.arange(len(nodes[s]))
        g2l.append(m)

    # shared node ids per ordered pair (sender s -> receiver s+d)
    shared: Dict[Tuple[int, int], np.ndarray] = {}
    sets = [np.zeros(nnode, dtype=bool) for s in range(S)]
    for s in range(S):
        sets[s][nodes[s]] = True
    for s1 in range(S):
        for s2 in range(s1 + 1, S):
            common = np.nonzero(sets[s1] & sets[s2])[0]  # sorted gids
            if len(common):
                shared[(s1, s2)] = common
                shared[(s2, s1)] = common

    offsets = sorted({s2 - s1 for (s1, s2) in shared})
    send, rpos, Ls = [], [], []
    for d in offsets:
        L = max(
            (len(v) for (s1, s2), v in shared.items() if s2 - s1 == d),
            default=0,
        )
        sd = np.full((S, L), Nl, dtype=np.int32)
        rp = np.full((S, Nl), L, dtype=np.int32)
        for s in range(S):
            # sender side: s -> s+d
            v = shared.get((s, s + d))
            if v is not None:
                sd[s, : len(v)] = g2l[s][v]
            # receiver side: s-d -> s
            v = shared.get((s - d, s))
            if v is not None:
                rp[s, g2l[s][v]] = np.arange(len(v))
        send.append(jnp.asarray(sd))
        rpos.append(jnp.asarray(rp))
        Ls.append(L)
    return NodeHalo(
        send=tuple(send), rpos=tuple(rpos),
        offsets=tuple(int(d) for d in offsets), Ls=tuple(Ls),
    )


def build_cg_shards(
    mesh,
    nshard: int,
    ncomp: int,
    bcnodes: Optional[np.ndarray] = None,
    algorithm: str = "sfc",
    dtype=None,
    epart: Optional[np.ndarray] = None,
    hierarchy=None,
) -> ShardedCG:
    """Partition a host mesh and build stacked, padded per-shard tables.

    epart (nelem,) overrides the partitioner with a precomputed
    element->shard assignment (so sibling table builders stay aligned).
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    coords, inpoel = mesh.coords, mesh.inpoel
    nnode, nelem = mesh.nnode, mesh.nelem

    Jg, gradg = tet_geometry(coords, inpoel)
    if not (Jg > 0).all():
        raise ValueError("mesh has non-positive element Jacobians")
    volg = nodal_volumes(coords, inpoel, nnode)

    if epart is None:
        epart = partition_for(coords, inpoel, nshard, algorithm,
                              hierarchy=hierarchy)
    elems = [np.nonzero(epart == s)[0] for s in range(nshard)]
    nodes = [np.unique(inpoel[e].ravel()) for e in elems]

    counts = np.zeros(nnode, dtype=np.int32)
    owner = np.full(nnode, nshard, dtype=np.int32)
    for s in range(nshard - 1, -1, -1):
        counts[nodes[s]] += 1
        owner[nodes[s]] = s
    bnd_gids = np.nonzero(counts >= 2)[0]
    nb = len(bnd_gids)
    slot_of = np.full(nnode, nb, dtype=np.int64)
    slot_of[bnd_gids] = np.arange(nb)

    Emax = max(len(e) for e in elems)
    Nmax = max(len(n) for n in nodes)

    bcset = np.zeros(nnode, dtype=bool)
    if bcnodes is not None and len(bcnodes) > 0:
        bcset[np.asarray(bcnodes, dtype=np.int64)] = True

    # per-shard nsup with a common D
    nsups, Ds = [], []
    for s in range(nshard):
        g2l = np.full(nnode, -1, dtype=np.int64)
        g2l[nodes[s]] = np.arange(len(nodes[s]))
        loc_inpoel = g2l[inpoel[elems[s]]]
        ns, D = build_nsup(loc_inpoel.astype(np.int32), len(nodes[s]))
        nsups.append((ns, loc_inpoel))
        Ds.append(D)
    Dmax = max(Ds) if Ds else 0

    S = nshard
    s_coords = np.zeros((S, 3, Nmax))
    s_inpoelT = np.zeros((S, 4, Emax), dtype=np.int32)
    s_J = np.ones((S, Emax))
    s_grad = np.zeros((S, 4, 3, Emax))
    s_vol = np.ones((S, Nmax))
    s_emask = np.zeros((S, Emax))
    s_nsup = np.full((S, Dmax, Nmax), 4 * Emax, dtype=np.int32)
    s_slot = np.full((S, Nmax), nb, dtype=np.int32)
    s_rev = np.full((S, nb + 1), Nmax, dtype=np.int32)
    s_owned = np.zeros((S, Nmax))
    s_bcmask = np.zeros((S, ncomp, Nmax))
    s_gids = np.full((S, Nmax), -1, dtype=np.int32)

    for s in range(S):
        e, n = elems[s], nodes[s]
        ne, nn = len(e), len(n)
        ns, loc_inpoel = nsups[s]
        s_coords[s, :, :nn] = coords[n].T
        s_inpoelT[s, :, :ne] = loc_inpoel.T
        s_J[s, :ne] = Jg[e]
        s_grad[s, :, :, :ne] = np.transpose(gradg[e], (1, 2, 0))
        s_vol[s, :nn] = volg[n]
        s_emask[s, :ne] = 1.0
        # remap this shard's nsup slot ids (a*ne + e) into the padded
        # slot space (a*Emax + e); pad slots point at 4*Emax
        a_idx = ns // ne if ne else ns
        e_idx = ns % ne if ne else ns
        valid = ns < 4 * ne
        s_nsup[s, : ns.shape[0], :nn] = np.where(
            valid, a_idx * Emax + e_idx, 4 * Emax
        )
        s_slot[s, :nn] = slot_of[n]
        on_bnd = slot_of[n] < nb
        s_rev[s, slot_of[n][on_bnd]] = np.nonzero(on_bnd)[0]
        s_owned[s, :nn] = (owner[n] == s).astype(np.float64)
        s_bcmask[s, :, :nn] = bcset[n][None, :].astype(np.float64)
        s_gids[s, :nn] = n
        if nn < Nmax:
            s_coords[s, :, nn:] = coords[n[0], :, None] if nn else 0.0

    from ..pde.cg import coords_cache_np

    s_cn, s_ctr = coords_cache_np(s_coords, s_inpoelT)
    geom = CGGeom(
        coords=jnp.asarray(s_coords, dtype=dtype),
        inpoelT=jnp.asarray(s_inpoelT),
        J=jnp.asarray(s_J, dtype=dtype),
        grad=jnp.asarray(s_grad, dtype=dtype),
        vol=jnp.asarray(s_vol, dtype=dtype),
        emask=jnp.asarray(s_emask, dtype=dtype),
        nsup=jnp.asarray(s_nsup),
        nnode=int(Nmax),
        coords_n=jnp.asarray(s_cn, dtype=dtype),
        ctr=jnp.asarray(s_ctr, dtype=dtype),
    )
    return ShardedCG(
        geom=geom,
        bnd_slot=jnp.asarray(s_slot),
        rev_slot=jnp.asarray(s_rev),
        owned=jnp.asarray(s_owned, dtype=dtype),
        bcmask=jnp.asarray(s_bcmask, dtype=dtype),
        gids=jnp.asarray(s_gids),
        nhalo=build_node_halo(nodes, nnode, Nmax),
        nshard=S,
        nb=nb,
        nnode_global=nnode,
        nelem_global=nelem,
    )


def gather_global_field(sharded: ShardedCG, u_stacked) -> np.ndarray:
    """Reassemble a global (C, nnode_global) field from stacked shards.

    u_stacked : (S, C, Nl); owned nodes contribute their values.
    """
    u = np.asarray(u_stacked)
    gids = np.asarray(sharded.gids)
    owned = np.asarray(sharded.owned) > 0
    out = np.zeros((u.shape[1], sharded.nnode_global), dtype=u.dtype)
    for s in range(sharded.nshard):
        m = owned[s]
        out[:, gids[s][m]] = u[s][:, m]
    return out
