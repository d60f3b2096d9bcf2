"""Pallas TPU kernels: windowed node gather + assembly for CG schemes.

The DiagCG+FCT step is data-movement bound on TPU: XLA lowers both the
nodal gather (u at each element's 4 nodes) and the gather-based nsup
assembly to serialized HBM gathers — measured 25 ms per (C, 4E) gather
and 14-48 ms per assembly at 663k tets, ~160 ms of a step that does
~5 ms of arithmetic (the reference hot loop this replaces:
src/Inciter/DiagCG.cpp:288-357 + src/Inciter/FluxCorrector.cpp).

This module re-uses the fused face pass's window scheme on the
node/slot incidence graph.  SLOTS are (element, corner) pairs in
element-major order (s = 4e + a, key = inpoel[e, a]).  With nodes
numbered by FIRST TOUCH in (Hilbert-ordered) element order
(mesh/reorder.py:first_touch_node_reorder), the keys of a TF-slot tile
concentrate in a sliding node window:

- each tile gets a MONOTONE block id blk[t] (never decreasing, so the
  revisit-accumulate/fresh-zero logic of ops/face_accum holds on the
  unsorted key stream); slots whose node falls in the tile's two-block
  window [blk*W, blk*W + 2W) are NEAR (measured ~90% at W=1024);
- NEAR gather/accumulation ride one-hot MXU matmuls against the
  in-VMEM window blocks — no HBM gather;
- FAR slots ride compact XLA gathers: for the gather direction the far
  nodes' values are fetched straight into the kernel's tile-padded
  layout and one-hot placed (the nbr_bounds v3 lesson: never chain
  compact->padded expansion gathers); for the assembly direction the
  far contributions are gathered from the flat slot stream in
  TARGET-SORTED order and accumulated by a standard sorted pass.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import onehot_dot, onehot_dotT

from .face_accum import _pass_tables, _make_kernel, _one_pass


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ks", "blk", "mlo", "mhi", "gfidx", "gfpos",
                 "afsrc", "ksF", "blkF", "mloF", "mhiF", "afcol"],
    meta_fields=["S", "Sp", "ntile", "TF", "W", "nblk",
                 "FTS", "NFP", "ntileF", "nblkF", "WF", "N", "E",
                 "nfar"],
)
@dataclasses.dataclass(frozen=True)
class NodePlan:
    """Window tables for the slot->node incidence.

    ks    : (1, Sp) i32 target node per slot; -1 = pad or far
    blk   : (ntile,) i32 monotone window block per tile
    mlo/mhi : (1, (nblk+2)*W) visited-block masks
    gfidx : (ntile*FTS,) i32 far-slot NODE ids, tile-padded (0 at pads)
    gfpos : (1, ntile*FTS) i32 tile-local slot position (-1 pad)
    afsrc : (NFP,) i32 far SLOT ids target-sorted (S = pad, reads the
            zero column appended to the flat contribution stream)
    ksF/blkF/mloF/mhiF : sorted far accumulation pass tables
    afcol : (NFP,) i32 same far slots in the same target-sorted
            order, but indexing the COMPACT tile-padded far stream
            (tile*FTS + position) that the fused CG kernels emit;
            ntile*FTS = pad (reads an appended pad column)
    """

    ks: jnp.ndarray
    blk: jnp.ndarray
    mlo: jnp.ndarray
    mhi: jnp.ndarray
    gfidx: jnp.ndarray
    gfpos: jnp.ndarray
    afsrc: jnp.ndarray
    ksF: jnp.ndarray
    blkF: jnp.ndarray
    mloF: jnp.ndarray
    mhiF: jnp.ndarray
    afcol: jnp.ndarray
    S: int
    Sp: int
    ntile: int
    TF: int
    W: int
    nblk: int
    FTS: int
    NFP: int
    ntileF: int
    nblkF: int
    WF: int
    N: int
    E: int
    nfar: int


def build_node_plan(inpoel, nnode: int, TF: int = 128, W: int = 1024,
                    dtype=np.float32, force=None) -> NodePlan:
    """Host-side plan from the connectivity (element-major slots).

    force: optional dict {ntile, nblk, FTS, ntileF, nblkF, WF} forcing
    those dimensions to AT LEAST the given values — used by the stacked
    (per-shard) builders so every shard's plan has identical static
    shapes and one compiled program serves all devices.  Forcing only
    widens/pads; the routing stays exact."""
    inpoel = np.asarray(inpoel)
    force = force or {}
    E = inpoel.shape[0]
    keys = inpoel.reshape(-1).astype(np.int64)        # s = 4e + a
    S = keys.shape[0]
    ntile = max((S + TF - 1) // TF, 1, force.get("ntile", 1))
    Sp = ntile * TF
    kp = np.full(Sp, -1, np.int64)
    kp[:S] = keys

    # monotone blocks: per tile pick the >= previous block covering the
    # most slots (candidates: the blocks the tile's nodes fall in)
    blk = np.zeros(ntile, np.int64)
    prev = 0
    tiles = kp.reshape(ntile, TF)
    for t in range(ntile):
        seg = tiles[t]
        seg = seg[seg >= 0]
        if len(seg) == 0:
            blk[t] = prev
            continue
        cands = np.unique(seg // W)
        cands = np.unique(np.concatenate([cands - 1, cands]))
        cands = cands[cands >= prev]
        if len(cands) == 0:
            blk[t] = prev
        else:
            hits = [((seg >= c * W) & (seg < (c + 2) * W)).sum()
                    for c in cands]
            blk[t] = cands[int(np.argmax(hits))]
        prev = blk[t]
    # the (nblk+2)*W scratch must cover ALL N nodes (outputs are sliced
    # to [:N]), even if the high blocks were never visited
    nblk = max(int(blk.max()) + 1, -(-nnode // W),
               force.get("nblk", 1))

    near = (kp >= 0) & (kp >= np.repeat(blk, TF) * W) \
        & (kp < (np.repeat(blk, TF) + 2) * W)
    far = (kp >= 0) & ~near
    ks = np.where(near, kp, -1).astype(np.int32)

    mlo = np.zeros((1, (nblk + 2) * W), dtype)
    mhi = np.zeros((1, (nblk + 2) * W), dtype)
    for b in np.unique(blk):
        mlo[0, b * W:(b + 1) * W] = 1.0
        mhi[0, (b + 1) * W:(b + 2) * W] = 1.0

    # far gather tables: tile-padded layout, FTS far slots per tile
    fslot = np.nonzero(far)[0]
    nfar = len(fslot)
    ftile = fslot // TF
    counts = np.bincount(ftile, minlength=ntile)
    FTS = max(128, int(-(-(counts.max() if nfar else 1) // 128) * 128),
              force.get("FTS", 128))
    NT = ntile * FTS
    col = (ftile * FTS + np.arange(nfar)
           - np.concatenate([[0], np.cumsum(counts)])[ftile])
    gfidx = np.zeros(NT, np.int32)
    gfpos = np.full(NT, -1, np.int32)
    gfidx[col] = kp[fslot]
    gfpos[col] = fslot - ftile * TF

    # far accumulation: slots sorted by target node
    order = np.argsort(kp[fslot], kind="stable")
    fsorted = fslot[order]
    ntileF = max((nfar + TF - 1) // TF, 1, force.get("ntileF", 1))
    NFP = ntileF * TF
    afsrc = np.full(NFP, S, np.int32)                 # S = zero pad col
    afsrc[:nfar] = fsorted
    afcol = np.full(NFP, NT, np.int32)                # NT = pad col
    afcol[:nfar] = col[order]
    keyF = np.full(NFP, -1, np.int64)
    keyF[:nfar] = kp[fsorted]
    WF = max(W, force.get("WF", W))
    while True:
        try:
            ksF, blkF, mloF, mhiF, ntF, nblkF = _pass_tables(
                keyF.astype(np.int32), TF, WF, dtype)
            break
        except ValueError:
            if WF >= 65536:
                raise
            WF *= 2
    need = max(-(-nnode // WF), force.get("nblkF", 1))
    if nblkF < need:                                   # cover all N nodes
        pad = (need - nblkF) * WF
        mloF = np.pad(mloF, ((0, 0), (0, pad)))
        mhiF = np.pad(mhiF, ((0, 0), (0, pad)))
        nblkF = need

    return NodePlan(
        ks=jnp.asarray(ks.reshape(1, -1)),
        blk=jnp.asarray(blk.astype(np.int32)),
        mlo=jnp.asarray(mlo), mhi=jnp.asarray(mhi),
        gfidx=jnp.asarray(gfidx),
        gfpos=jnp.asarray(gfpos.reshape(1, -1)),
        afsrc=jnp.asarray(afsrc),
        ksF=jnp.asarray(ksF.reshape(1, -1)),
        blkF=jnp.asarray(blkF),
        mloF=jnp.asarray(mloF), mhiF=jnp.asarray(mhiF),
        afcol=jnp.asarray(afcol),
        S=S, Sp=Sp, ntile=ntile, TF=TF, W=W, nblk=nblk,
        FTS=FTS, NFP=NFP, ntileF=ntF, nblkF=nblkF, WF=WF,
        N=nnode, E=E, nfar=nfar,
    )


def _make_gather_kernel(TF, W, C, FTS):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fv_ref, fpos_ref,
               o_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        dt_ = ulo_ref.dtype
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        hot_lo = jnp.where(locc == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hot_hi = jnp.where(locc - W == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]

        def dotT(a, m):
            return onehot_dotT(a, m)

        out = dotT(ulo_ref[...], hot_lo) + dotT(uhi_ref[...], hot_hi)

        # far placement: one-hot (FTS, TF) drops each far value into
        # its slot column (positions unique per tile)
        fpos = fpos_ref[0, :]
        pv = jnp.where(fpos >= 0, 1.0, 0.0).astype(dt_)
        iotf = jax.lax.broadcasted_iota(jnp.int32, (FTS, TF), 1)
        hotf = jnp.where(fpos[:, None] == iotf, 1.0, 0.0).astype(dt_) \
            * pv[:, None]
        out = out + onehot_dot(fv_ref[...], hotf)
        o_ref[...] = out

    return kernel


def gather_nodes_window(plan: NodePlan, U, interpret=None):
    """U (C, N) -> (4, C, E): u at each element's 4 corners, matching
    ops.assembly.gather_nodes(U, inpoelT)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, N = U.shape
    TF, W = plan.TF, plan.W
    NBW = (plan.nblk + 2) * W
    Up = jnp.pad(U, ((0, 0), (0, NBW - N)))
    fv = U[:, plan.gfidx]                              # (C, ntile*FTS)
    out = pl.pallas_call(
        _make_gather_kernel(TF, W, C, plan.FTS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(plan.ntile,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t] + 1)),
                pl.BlockSpec((C, plan.FTS), lambda t, blk: (0, t)),
                pl.BlockSpec((1, plan.FTS), lambda t, blk: (0, t)),
            ],
            out_specs=pl.BlockSpec((C, TF), lambda t, blk: (0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, plan.Sp), U.dtype),
        interpret=interpret,
    )(plan.blk, plan.ks, Up, Up, fv, plan.gfpos)
    # slot-major (C, 4E) -> (4, C, E)
    return jnp.moveaxis(out[:, :plan.S].reshape(C, plan.E, 4), 2, 0)


def _flat_slots(contrib):
    """(4, C, E) element slabs -> (C, 4E) slot-major stream + zero pad
    column (read by afsrc pads)."""
    A, C, E = contrib.shape
    x = jnp.moveaxis(contrib, 0, 2).reshape(C, A * E)
    return jnp.concatenate([x, jnp.zeros((C, 1), contrib.dtype)], axis=1)


def assemble_add_window(plan: NodePlan, contrib, interpret=None):
    """contrib (4, C, E) -> (C, N): sum of each node's incident slots,
    matching ops.assembly.assemble_add(contrib, nsup)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = _flat_slots(contrib)                           # (C, 4E+1)
    near = _one_pass(x[:, :-1], plan.ks, plan.blk, plan.mlo, plan.mhi,
                     plan.ntile, plan.nblk, plan.TF, plan.W, plan.N,
                     interpret=interpret)
    xf = x[:, plan.afsrc]                              # (C, NFP)
    farp = _one_pass(xf, plan.ksF, plan.blkF, plan.mloF, plan.mhiF,
                     plan.ntileF, plan.nblkF, plan.TF, plan.WF, plan.N,
                     interpret=interpret)
    return near + farp


def _make_extreme_kernel(TF, W):
    """Max-accumulate valid slot values into the window (one value per
    one-hot column; invalid columns contribute -BIG)."""

    def kernel(blk_ref, ks_ref, x_ref, lo_ref, hi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])
        dt_ = x_ref.dtype
        BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.full_like(lo_ref, -BIG)
            hi_ref[...] = jnp.full_like(hi_ref, -BIG)

        ks = ks_ref[0, :]
        loc = ks - b * W
        x = x_ref[...]                                 # (R, TF)
        # Mosaic can't minor-insert i1 vectors: keep validity as float
        # and predicate on the 2-D broadcast
        vf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        m_lo = (locc == iota) & (vf[:, None] > 0)
        m_hi = ((locc - W) == iota) & (vf[:, None] > 0)
        cand_lo = jnp.where(m_lo[None], x[:, :, None], -BIG).max(axis=1)
        cand_hi = jnp.where(m_hi[None], x[:, :, None], -BIG).max(axis=1)
        lo_ref[...] = jnp.maximum(lo_ref[...], cand_lo)
        hi_ref[...] = jnp.maximum(hi_ref[...], cand_hi)

    return kernel


def _one_pass_max(x, ks, blk, mlo, mhi, ntile, nblk, TF, W, N,
                  interpret):
    R = x.shape[0]
    Sp = ntile * TF
    if x.shape[-1] < Sp:
        x = jnp.pad(x, ((0, 0), (0, Sp - x.shape[-1])))
    BIG = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype) / 2
    lo, hi = pl.pallas_call(
        _make_extreme_kernel(TF, W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((R, TF), lambda t, blk: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((R, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((R, W), lambda t, blk: (0, blk[t] + 1)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, (nblk + 2) * W), x.dtype),
            jax.ShapeDtypeStruct((R, (nblk + 2) * W), x.dtype),
        ],
        interpret=interpret,
    )(blk, ks, x)
    lo = jnp.where(mlo > 0, lo, -BIG)
    hi = jnp.where(mhi > 0, hi, -BIG)
    return jnp.maximum(lo, hi)[:, :N]


def assemble_max_window(plan: NodePlan, contrib, interpret=None):
    """contrib (4, C, E) -> (C, N): max over each node's incident
    slots, matching ops.assembly.assemble_max(contrib, nsup).  (min
    folds in by negation, as every caller already does.)"""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = _flat_slots(contrib)
    dt_ = x.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2
    # the zero pad column must not win the max at pad slots of the far
    # stream: ksF = -1 masks them inside the kernel, nothing else needed
    near = _one_pass_max(x[:, :-1], plan.ks, plan.blk, plan.mlo,
                         plan.mhi, plan.ntile, plan.nblk, plan.TF,
                         plan.W, plan.N, interpret)
    xf = x[:, plan.afsrc]
    farp = _one_pass_max(xf, plan.ksF, plan.blkF, plan.mloF, plan.mhiF,
                         plan.ntileF, plan.nblkF, plan.TF, plan.WF,
                         plan.N, interpret)
    out = jnp.maximum(near, farp)
    fill = jnp.asarray(jnp.finfo(dt_).min, dt_)
    # nodes some stream never touched carry -BIG halves; the contract
    # (assembly.assemble_max) fills untouched nodes with finfo.min
    return jnp.where(out <= -BIG / 2, fill, out)
