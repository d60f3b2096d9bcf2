"""Pallas TPU kernel: face-to-element flux accumulation.

The DG surface pass ends with a scatter-shaped reduction
(dg_rhs's tail; DG.cpp surfInt's R(el) -= .., R(er) += ..):

    acc[:, :, el[f]] += contribL[:, :, f]      all faces
    acc[:, :, er[f]] += contribR[:, :, f]      interior faces

The XLA formulation (gather each element's 4 face slots through `fose`)
is the hottest op of the whole step at scale: the padded (C, K, F)
gathers run at ~3.6 GB/s effective on v5e (~360 ms of a 775 ms Sedov
DG(P1) step at 663k tets).

This kernel exploits build_dggeom's el-sorted face order: a tile of TF
consecutive faces targets a bounded window of elements (measured: TF
faces span <= TF/2 + 1 elements on SFC-ordered tet meshes), so each tile
accumulates through a one-hot MXU matmul into two aligned element blocks
(the window straddles at most two W-blocks).  Right-side contributions
are permuted to an er-sorted order first (one 15-row gather), then
accumulated the same way.  Measured 24x faster than the fose gathers at
48^3 (11.6 ms vs 276 ms per rhs).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import onehot_dot


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ks", "ker", "blk", "mlo", "mhi",
        "xil", "xir", "fn", "fa", "bt", "mex",
    ],
    meta_fields=["ntile", "nblk", "W"],
)
@dataclasses.dataclass(frozen=True)
class FusedStream:
    """One el-sorted face stream for the near/far fused pass: window
    tables plus the stream-permuted static face tables (so the kernel
    reads them blocked, no runtime permute)."""

    ks: jnp.ndarray    # (1, Fp) i32 el target per face (-1 pad)
    ker: jnp.ndarray   # (1, Fp) i32 er target (-1 pad/boundary-no-R)
    blk: jnp.ndarray   # (ntile,) i32
    mlo: jnp.ndarray   # (1, (nblk+NB)*W) visited-as-offset-0 mask
    mhi: jnp.ndarray   # (1, (nblk+NB)*W) visited-as-offset-1 mask
    xil: jnp.ndarray   # (3G, Fp) static face Gauss coords (left)
    xir: jnp.ndarray
    fn: jnp.ndarray    # (3, Fp)
    fa: jnp.ndarray    # (1, Fp) farea*fmask
    bt: jnp.ndarray    # (1, Fp) i32 bctype
    ntile: int
    nblk: int
    W: int             # this stream's window (far streams need wider)
    #: offset-2.. visited-block masks, (NB-2, (nblk+NB)*W), for the
    #: widened right-state window (QUINOA_NEAR_NB=4: er admitted from
    #: FOUR output-aligned blocks, halving the far stream); None for
    #: the classic 2-block streams
    mex: Optional[jnp.ndarray] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "near", "far", "erF", "elFR",
        "ksRF", "blkRF", "mloRF", "mhiRF", "xirRF", "permRF", "ipermRF",
    ],
    meta_fields=["ntileRF", "nblkRF", "Fn", "Ff", "WRF"],
)
@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Near/far split for the fused face pass: 'near' faces have er in
    the same W-block as el (67-84% on SFC meshes), so the kernel
    gathers BOTH states in-window and accumulates both sides (plus the
    dt charvel row) directly; only 'far' faces pre-gather er states and
    run the er-sorted R pass."""

    near: FusedStream
    far: FusedStream
    erF: jnp.ndarray     # (FpF,) i32 er of far faces (0 pad) for UvR
    elFR: jnp.ndarray    # (FpRF,) i32 el of far faces, er-sorted (0 pad) —
    #                      value-gather indices for the limiter bounds pass
    ksRF: jnp.ndarray    # far R pass tables (er-sorted within far)
    blkRF: jnp.ndarray
    mloRF: jnp.ndarray
    mhiRF: jnp.ndarray
    xirRF: jnp.ndarray   # (3G, FpRF) er-sorted static xi_r of far faces
    permRF: jnp.ndarray  # (FpF,) er-sort permutation of the far stream
    ipermRF: jnp.ndarray  # (FpF,) inverse: er-sorted -> el-sorted order
    ntileRF: int
    nblkRF: int
    Fn: int
    Ff: int
    WRF: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ksL", "blkL", "mloL", "mhiL",
        "permR", "ksR", "blkR", "mloR", "mhiR", "xirR", "fused",
    ],
    meta_fields=["ntileL", "nblkL", "ntileR", "nblkR", "TF", "W", "F", "E"],
)
@dataclasses.dataclass(frozen=True)
class AccumPlan:
    """Static tables for the two accumulation passes (device arrays are
    jit ARGUMENTS via the pytree, never HLO constants)."""

    ksL: jnp.ndarray     # (1, FpL) i32 target element per sorted face (-1 pad)
    blkL: jnp.ndarray    # (ntileL,) i32 aligned output block per tile
    mloL: jnp.ndarray    # (1, (nblkL+2)*W) visited-block masks
    mhiL: jnp.ndarray
    permR: jnp.ndarray   # (F,) i32 er-sort permutation of the face axis
    ksR: jnp.ndarray
    blkR: jnp.ndarray
    mloR: jnp.ndarray
    mhiR: jnp.ndarray
    xirR: Optional[jnp.ndarray]  # (3G, FpR) er-sorted face Gauss coords
    fused: Optional[FusedPlan]   # near/far split (single-chip builds)
    ntileL: int
    nblkL: int
    ntileR: int
    nblkR: int
    TF: int
    W: int
    F: int
    E: int


def _pass_tables(key: np.ndarray, TF: int, W: int, dtype, E=None):
    """(ks, blk, lo_mask, hi_mask, ntile, nblk) for one pass; key entries
    of -1 are skipped faces.  E (optional) is the full element-axis
    width the pass's (nblk+2)*W scratch must cover: padded axes can
    carry trailing elements no face references (overdecomposed super-
    shards), and the output slice [:, :E] needs the scratch to reach
    them."""
    F = key.shape[0]
    ntile = max((F + TF - 1) // TF, 1)
    Fp = ntile * TF
    ks = np.full(Fp, -1, np.int32)
    ks[:F] = key
    blk = np.zeros(ntile, np.int32)
    for t in range(ntile):
        seg = ks[t * TF:(t + 1) * TF]
        real = seg[seg >= 0]
        if len(real):
            b = int(real.min())
            span = int(real.max()) - b
            if span >= W:
                raise ValueError(
                    f"face tile {t} spans {span + 1} elements > window {W}; "
                    "faces are not el-sorted or the mesh locality is too "
                    "poor for this window")
            blk[t] = b // W
        else:
            # tile of skipped faces only: carry the previous block forward
            # so the block sequence stays monotone (a fresh revisit of an
            # earlier block would re-zero it in the kernel)
            blk[t] = blk[t - 1] if t else 0
    nblk = int(blk.max()) + 1
    if E is not None:
        nblk = max(nblk, -(-int(E) // W) - 2)
    lo = np.zeros((1, (nblk + 2) * W), dtype)
    hi = np.zeros((1, (nblk + 2) * W), dtype)
    for b in set(blk.tolist()):
        lo[0, b * W:(b + 1) * W] = 1.0
        hi[0, (b + 1) * W:(b + 2) * W] = 1.0
    return ks, blk, lo, hi, ntile, nblk


def _plan_arrays_fit(el, er, xi_r, E, dtype, TF, W, fmask=None):
    """(_plan_arrays result, fitted W): double the window until every
    el-/er-sorted tile's element span fits (el-sorted TF-face tiles can
    span >TF elements where many elements own a single left face)."""
    Wt = W
    while True:
        try:
            return _plan_arrays(el, er, xi_r, E, dtype, TF, Wt,
                                fmask=fmask), Wt
        except ValueError:
            if Wt >= 8192:
                raise
            Wt *= 2


def _plan_arrays(el, er, xi_r, E, dtype, TF, W, fmask=None):
    """Numpy plan pieces for one (sub)mesh; fmask marks real faces when
    the face axis carries padding (per-shard stacked builds)."""
    el = np.asarray(el).astype(np.int64)
    er = np.asarray(er).astype(np.int64)
    F = el.shape[0]
    real = (np.asarray(fmask) > 0) if fmask is not None \
        else np.ones(F, dtype=bool)
    keyL = np.where(real, el, -1)
    if not (np.diff(el[real]) >= 0).all():
        raise ValueError("build_accum_plan needs el-sorted faces")

    ksL, blkL, mloL, mhiL, ntileL, nblkL = _pass_tables(
        keyL.astype(np.int32), TF, W, dtype, E=E)

    interior = (er != el) & real
    keyR = np.where(interior, er, np.iinfo(np.int64).max)
    permR = np.argsort(keyR, kind="stable").astype(np.int32)
    ksR_key = np.where(interior[permR], er[permR], -1).astype(np.int32)
    ksR, blkR, mloR, mhiR, ntileR, nblkR = _pass_tables(ksR_key, TF, W,
                                                        dtype, E=E)

    # er-sorted static face Gauss coords for the basis-contracting R
    # pass (the runtime permute then only moves the (C*G) weighted-flux
    # rows, not the (C*K) contributions — XLA's gather cost triples
    # above 16 rows)
    xi_r = np.asarray(xi_r)
    G = xi_r.shape[1]
    xirR_ = xi_r.reshape(3 * G, F)[:, permR].astype(dtype)
    FpR = ntileR * TF
    xirR_ = np.pad(xirR_, ((0, 0), (0, FpR - F)))
    return dict(
        ksL=ksL.reshape(1, -1), blkL=blkL, mloL=mloL, mhiL=mhiL,
        permR=permR, ksR=ksR.reshape(1, -1), blkR=blkR, mloR=mloR,
        mhiR=mhiR, xirR=xirR_, ntileL=ntileL, nblkL=nblkL,
        ntileR=ntileR, nblkR=nblkR, F=F, E=E,
    )


def _fit_tables(key, TF, W, dtype, E=None):
    """Widen the window (doubling keeps every Ws a multiple of the
    classification W, which the near in-window guarantee relies on)
    until every tile's span fits."""
    Wt = W
    while True:
        try:
            return (Wt,) + _pass_tables(key, TF, Wt, dtype, E=E)
        except ValueError:
            if Wt >= 8192:
                raise
            Wt *= 2


def _fused_plan_arrays(el, er, xi_l, xi_r, fn, farea, fmask, bctype,
                       TF, W, dtype, force=None, E=None, nb=None):
    """Numpy pieces + metas of a FusedPlan for one (sub)mesh.

    `force` pins the stream metas {Wn, Wf, WRF, ntileN, ntileF,
    nblkN, nblkF, nblkRF} so per-shard plans come out with UNIFORM
    shapes for stacked shard_map builds (extra tiles carry only pad
    faces; masks are zero beyond each shard's own blocks).  fmask
    (None = all real) marks real faces on padded per-shard face axes.

    `nb` (QUINOA_NEAR_NB, default 2) is the near kernel's right-state
    window in output-aligned W-blocks: 4 admits er up to three blocks
    above the tile anchor (on 48^3 Hilbert meshes that halves the far
    stream — measured d=er//W-el//W histogram: 58k/19k/17k of 211k far
    faces at d=1/2/3), at the cost of two extra one-hot gather masks
    and two extra accumulation output arrays in the near kernel.
    """
    import os

    if nb is None:
        nb = int(os.environ.get("QUINOA_NEAR_NB", "2"))
    assert nb in (2, 3, 4)
    el = np.asarray(el).astype(np.int64)
    er = np.asarray(er).astype(np.int64)
    F = el.shape[0]
    real = (np.asarray(fmask) > 0) if fmask is not None \
        else np.ones(F, dtype=bool)
    interior = (er != el) & real
    # near: er inside the tile's nb-BLOCK output window [b*W, b*W+nb*W)
    # (the kernel's right-state gather covers locr in [0, nb*W), so
    # er//W == el//W is sufficient but NOT necessary).  Same-block faces
    # are window-safe for any tile anchor; er in a block above is
    # admitted by a demotion fixed point, since the anchor b[t] = min el
    # of the tile // W depends on the selection itself.  The guarantee
    # survives the later window doubling (_fit_tables): for Ws = k*W the
    # anchor window [b2*Ws, b2*Ws + nb*Ws) contains [b*W, b*W + nb*W).
    # Measured on v5e (48^3 Sedov dgp1): the far stream costs ~4.5x per
    # face vs near, and this reclassification moves ~40% of far faces.
    near = real & (~interior | ((er // W) == (el // W)))
    cand = real & interior & ~near \
        & (np.abs(er // W - el // W) <= nb - 1)
    near2 = near | cand
    while True:
        idxN = np.nonzero(near2)[0]
        if not len(idxN):
            break
        tl = np.arange(len(idxN)) // TF
        ntl = int(tl[-1]) + 1
        bmin = np.full(ntl, np.iinfo(np.int64).max)
        np.minimum.at(bmin, tl, el[idxN])
        b = (bmin // W)[tl]
        erb = er[idxN] // W
        # same-block faces are safe under ANY anchor (never demote);
        # others must land in this tile's [b, b+nb) window
        okf = ~interior[idxN] | (erb == el[idxN] // W) \
            | ((erb >= b) & (erb <= b + nb - 1))
        if okf.all():
            break
        near2[idxN[~okf]] = False
    near = near2
    idxN = np.nonzero(near)[0]
    idxF = np.nonzero(real & ~near)[0]
    G = np.asarray(xi_l).shape[1]

    xils = np.asarray(xi_l).reshape(3 * G, -1).astype(dtype)
    xirs = np.asarray(xi_r).reshape(3 * G, -1).astype(dtype)
    fns = np.asarray(fn).astype(dtype)
    fas = (np.asarray(farea) * (real.astype(dtype)
           if fmask is not None else 1.0)).astype(dtype)
    bts = np.asarray(bctype).astype(np.int32)

    def stream(idx, skey, sW, sntile, snblk, snb=2):
        ks_el = el[idx].astype(np.int32)
        if sntile is not None:
            ks_el = np.concatenate(
                [ks_el, np.full(sntile * TF - len(idx), -1, np.int32)])
        if sW is None:
            Ws, ks, blk, mlo, mhi, ntile, nblk = _fit_tables(
                ks_el, TF, W, dtype, E=E)
        else:
            Ws = sW
            ks, blk, mlo, mhi, ntile, nblk = _pass_tables(
                ks_el, TF, Ws, dtype, E=E)
        if snblk is not None and nblk < snblk:
            pad = (snblk - nblk) * Ws
            mlo = np.pad(mlo, ((0, 0), (0, pad)))
            mhi = np.pad(mhi, ((0, 0), (0, pad)))
            nblk = snblk
        mex = None
        if snb > 2:
            # rebuild ALL snb visited-block masks at the wider
            # (nblk+snb)*Ws output width (offset j marks blocks the
            # kernel accumulates through output array j)
            ms = np.zeros((snb, (nblk + snb) * Ws), dtype)
            for b_ in sorted(set(blk.tolist())):
                for j in range(snb):
                    ms[j, (b_ + j) * Ws:(b_ + j + 1) * Ws] = 1.0
            mlo, mhi, mex = ms[0:1], ms[1:2], ms[2:]
        Fp = ntile * TF
        kerp = np.full(Fp, -1, np.int32)
        kerp[: len(idx)] = np.where(interior[idx], er[idx], -1)

        def tab(a, pad=0.0):
            out = np.full(a.shape[:-1] + (Fp,), pad, dtype=a.dtype)
            out[..., : len(idx)] = a[..., idx]
            return out if out.ndim == 2 else out[None]

        return dict(
            ks=ks.reshape(1, -1), ker=kerp.reshape(1, -1), blk=blk,
            mlo=mlo, mhi=mhi, mex=mex, xil=tab(xils), xir=tab(xirs),
            fn=tab(fns), fa=tab(fas), bt=tab(bts),
            ntile=ntile, nblk=nblk, W=Ws, nreal=len(idx),
        )

    f = force or {}
    sN = stream(idxN, "N", f.get("Wn"), f.get("ntileN"), f.get("nblkN"),
                snb=nb)
    sF = stream(idxF, "F", f.get("Wf"), f.get("ntileF"), f.get("nblkF"))

    # far R pass: er-sort within the PADDED far stream (pads sort last)
    FpF = sF["ntile"] * TF
    erf_p = np.full(FpF, np.iinfo(np.int64).max, np.int64)
    erf_p[: len(idxF)] = er[idxF]
    permRF = np.argsort(erf_p, kind="stable").astype(np.int32)
    keyRF = np.where(erf_p[permRF] == np.iinfo(np.int64).max, -1,
                     erf_p[permRF]).astype(np.int32)
    if f.get("WRF") is None:
        WRF, ksRF, blkRF, mloRF, mhiRF, ntileRF, nblkRF = _fit_tables(
            keyRF, TF, W, dtype, E=E)
    else:
        WRF = f["WRF"]
        ksRF, blkRF, mloRF, mhiRF, ntileRF, nblkRF = _pass_tables(
            keyRF, TF, WRF, dtype, E=E)
    if f.get("nblkRF") is not None and nblkRF < f["nblkRF"]:
        pad = (f["nblkRF"] - nblkRF) * WRF
        mloRF = np.pad(mloRF, ((0, 0), (0, pad)))
        mhiRF = np.pad(mhiRF, ((0, 0), (0, pad)))
        nblkRF = f["nblkRF"]
    # er-sorted static tables: permute the PADDED far tables (pads are
    # zero faces with ks=-1 in the R pass, so they accumulate nothing)
    xirRF = sF["xir"][:, permRF]
    erF = np.maximum(sF["ker"][0], 0).astype(np.int32)
    elFR = np.maximum(sF["ks"][0][permRF], 0).astype(np.int32)

    return dict(
        near=sN, far=sF, erF=erF, elFR=elFR,
        ksRF=ksRF.reshape(1, -1), blkRF=blkRF, mloRF=mloRF,
        mhiRF=mhiRF, xirRF=xirRF, permRF=permRF,
        ipermRF=np.argsort(permRF, kind="stable").astype(np.int32),
        ntileRF=ntileRF, nblkRF=nblkRF,
        Fn=sN["nreal"], Ff=FpF, WRF=WRF,
    )


def _stream_from_arrays(d, to_jnp=jnp.asarray) -> FusedStream:
    return FusedStream(
        ks=to_jnp(d["ks"]), ker=to_jnp(d["ker"]), blk=to_jnp(d["blk"]),
        mlo=to_jnp(d["mlo"]), mhi=to_jnp(d["mhi"]),
        xil=to_jnp(d["xil"]), xir=to_jnp(d["xir"]), fn=to_jnp(d["fn"]),
        fa=to_jnp(d["fa"]), bt=to_jnp(d["bt"]),
        ntile=d["ntile"], nblk=d["nblk"], W=d["W"],
        mex=(to_jnp(d["mex"]) if d.get("mex") is not None else None),
    )


def _fused_from_arrays(p, to_jnp=jnp.asarray) -> FusedPlan:
    return FusedPlan(
        near=_stream_from_arrays(p["near"], to_jnp),
        far=_stream_from_arrays(p["far"], to_jnp),
        erF=to_jnp(p["erF"]), elFR=to_jnp(p["elFR"]),
        ksRF=to_jnp(p["ksRF"]), blkRF=to_jnp(p["blkRF"]),
        mloRF=to_jnp(p["mloRF"]), mhiRF=to_jnp(p["mhiRF"]),
        xirRF=to_jnp(p["xirRF"]), permRF=to_jnp(p["permRF"]),
        ipermRF=to_jnp(p["ipermRF"]),
        ntileRF=p["ntileRF"], nblkRF=p["nblkRF"],
        Fn=p["Fn"], Ff=p["Ff"], WRF=p["WRF"],
    )


def _build_fused_plan(geom, TF, W, dtype) -> FusedPlan:
    """Near/far face split for the fully fused pass (single-chip
    geoms: exact face count, no padding)."""
    p = _fused_plan_arrays(
        geom.el, geom.er, geom.xi_l, geom.xi_r, geom.fn,
        np.asarray(geom.farea) * np.asarray(geom.fmask), None,
        geom.bctype, TF, W, dtype, E=int(geom.nelem))
    return _fused_from_arrays(p)


def build_accum_plan(geom, TF: int = 128, W: int = 128) -> AccumPlan:
    """Host-side plan from an el-sorted DGGeom.  W must exceed the widest
    per-tile element span of both passes (el-sorted tiles span <= ~TF/2;
    er-sorted likewise).  TF=128 (the Pallas lane floor) is the
    measured optimum for the near/far fused pass at 663k tets (4.88M
    updates/s vs 4.56M at 256; 1024 OOMs the 16M scoped VMEM with the
    fused kernel's one-hot windows).  QUINOA_FACE_TF/QUINOA_FACE_W
    override for on-chip sweeps (wider W raises the near-face share at
    the cost of wider one-hot builds)."""
    import os

    TF = int(os.environ.get("QUINOA_FACE_TF", TF))
    W = int(os.environ.get("QUINOA_FACE_W", W))
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    p, WL = _plan_arrays_fit(geom.el, geom.er, geom.xi_r,
                             int(geom.nelem), dtype, TF, W)
    fused = _build_fused_plan(geom, TF, W, dtype)
    return AccumPlan(
        ksL=jnp.asarray(p["ksL"]),
        blkL=jnp.asarray(p["blkL"]),
        mloL=jnp.asarray(p["mloL"]),
        mhiL=jnp.asarray(p["mhiL"]),
        permR=jnp.asarray(p["permR"]),
        ksR=jnp.asarray(p["ksR"]),
        blkR=jnp.asarray(p["blkR"]),
        mloR=jnp.asarray(p["mloR"]),
        mhiR=jnp.asarray(p["mhiR"]),
        xirR=jnp.asarray(p["xirR"]),
        fused=fused,
        ntileL=p["ntileL"], nblkL=p["nblkL"],
        ntileR=p["ntileR"], nblkR=p["nblkR"],
        TF=TF, W=WL, F=p["F"], E=p["E"],
    )


def build_accum_plan_stacked(sharded_geom, TF: int = 128,
                             W: int = 128) -> AccumPlan:
    """Per-shard plans padded to UNIFORM static shapes and stacked with
    a leading shard axis, so one shard_map program serves every device
    (ShardedDG geoms: every data field carries [S]; faces are el-sorted
    per shard with fmask marking real faces).  Includes a stacked
    near/far FusedPlan (fit each shard, then rebuild every shard at the
    max metas) so the SPMD rhs runs the same fused kernels as the
    single-chip solver."""
    g = sharded_geom
    # pull each device table to host exactly ONCE: on the axon TPU
    # backend every np.asarray(g.xi_l) is a ~100 MB device->host
    # transfer over the tunnel, and the fit->rebuild passes below
    # otherwise re-pull the same tables four times (measured ~165 s of
    # the npes=1 solver construction)
    gnp = {k: np.asarray(getattr(g, k))
           for k in ("vol", "el", "er", "xi_l", "xi_r", "fn", "farea",
                     "fmask", "bctype")}
    S = gnp["vol"].shape[0]
    dtype = np.dtype(gnp["vol"].dtype)
    El = int(gnp["vol"].shape[1])
    fitL = [
        _plan_arrays_fit(
            gnp["el"][s], gnp["er"][s], gnp["xi_r"][s],
            El, dtype, TF, W, fmask=gnp["fmask"][s],
        )[1]
        for s in range(S)
    ]
    WL = max(fitL)
    plans = [
        _plan_arrays(
            gnp["el"][s], gnp["er"][s], gnp["xi_r"][s],
            El, dtype, TF, WL, fmask=gnp["fmask"][s],
        )
        for s in range(S)
    ]
    # uniform tile counts follow from the common padded face count; only
    # the visited-block masks vary in width — pad them to the max
    ntileL = plans[0]["ntileL"]
    ntileR = plans[0]["ntileR"]
    assert all(p["ntileL"] == ntileL and p["ntileR"] == ntileR
               for p in plans)
    nblkL = max(p["nblkL"] for p in plans)
    nblkR = max(p["nblkR"] for p in plans)

    def stack(key, width=None):
        arrs = [p[key] for p in plans]
        if width is not None:
            arrs = [
                np.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, width - a.shape[-1])])
                for a in arrs
            ]
        return jnp.asarray(np.stack(arrs))

    # fused near/far plans: fit pass -> common (max) metas -> rebuild
    def fargs(s):
        return (gnp["el"][s], gnp["er"][s],
                gnp["xi_l"][s], gnp["xi_r"][s],
                gnp["fn"][s], gnp["farea"][s],
                gnp["fmask"][s], gnp["bctype"][s])

    fit = [_fused_plan_arrays(*fargs(s), TF, W, dtype, E=El)
           for s in range(S)]
    force = dict(
        Wn=max(p["near"]["W"] for p in fit),
        Wf=max(p["far"]["W"] for p in fit),
        WRF=max(p["WRF"] for p in fit),
        ntileN=max(p["near"]["ntile"] for p in fit),
        ntileF=max(p["far"]["ntile"] for p in fit),
        nblkN=max(p["near"]["nblk"] for p in fit),
        nblkF=max(p["far"]["nblk"] for p in fit),
        nblkRF=max(p["nblkRF"] for p in fit),
    )
    fps = [_fused_plan_arrays(*fargs(s), TF, W, dtype, force=force,
                              E=El)
           for s in range(S)]

    def fstack(path):
        def get(p):
            a = p
            for k in path:
                a = a[k]
            return a
        return jnp.asarray(np.stack([get(p) for p in fps]))

    def sstream(key):
        d0 = fps[0][key]
        return FusedStream(
            ks=fstack((key, "ks")), ker=fstack((key, "ker")),
            blk=fstack((key, "blk")), mlo=fstack((key, "mlo")),
            mhi=fstack((key, "mhi")), xil=fstack((key, "xil")),
            xir=fstack((key, "xir")), fn=fstack((key, "fn")),
            fa=fstack((key, "fa")), bt=fstack((key, "bt")),
            ntile=d0["ntile"], nblk=d0["nblk"], W=d0["W"],
            mex=(fstack((key, "mex")) if d0.get("mex") is not None
                 else None),
        )

    fused = FusedPlan(
        near=sstream("near"), far=sstream("far"),
        erF=fstack(("erF",)), elFR=fstack(("elFR",)),
        ksRF=fstack(("ksRF",)), blkRF=fstack(("blkRF",)),
        mloRF=fstack(("mloRF",)), mhiRF=fstack(("mhiRF",)),
        xirRF=fstack(("xirRF",)), permRF=fstack(("permRF",)),
        ipermRF=fstack(("ipermRF",)),
        ntileRF=fps[0]["ntileRF"], nblkRF=fps[0]["nblkRF"],
        Fn=fps[0]["Fn"], Ff=fps[0]["Ff"], WRF=fps[0]["WRF"],
    )

    return AccumPlan(
        ksL=stack("ksL"),
        blkL=stack("blkL"),
        mloL=stack("mloL", (nblkL + 2) * WL),
        mhiL=stack("mhiL", (nblkL + 2) * WL),
        permR=stack("permR"),
        ksR=stack("ksR"),
        blkR=stack("blkR"),
        mloR=stack("mloR", (nblkR + 2) * WL),
        mhiR=stack("mhiR", (nblkR + 2) * WL),
        xirR=stack("xirR"),
        fused=fused,
        ntileL=ntileL, nblkL=nblkL, ntileR=ntileR, nblkR=nblkR,
        TF=TF, W=WL, F=plans[0]["F"], E=El,
    )


def _make_kernel(TF, W):
    def kernel(blk_ref, ks_ref, x_ref, lo_ref, hi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]                       # (TF,) target elements
        loc = ks - b * W                        # local offset in [0, 2W)
        x = x_ref[...]                          # (C, K, TF) or (CK, TF)
        if x.ndim == 3:
            x = x.reshape(x.shape[0] * x.shape[1], TF)
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(x.dtype)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)

    return kernel


def _one_pass(x, ks, blk, mlo, mhi, ntile, nblk, TF, W, E,
              interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rank3 = x.ndim == 3
    CK = x.shape[0] * x.shape[1] if rank3 else x.shape[0]
    Fp = ntile * TF
    if x.shape[-1] < Fp:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Fp - x.shape[-1])]
        x = jnp.pad(x, pad)
    xspec = (pl.BlockSpec((x.shape[0], x.shape[1], TF),
                          lambda t, blk: (0, 0, t))
             if rank3 else pl.BlockSpec((CK, TF), lambda t, blk: (0, t)))
    lo, hi = pl.pallas_call(
        _make_kernel(TF, W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                xspec,
            ],
            out_specs=[
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t] + 1)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((CK, (nblk + 2) * W), x.dtype),
            jax.ShapeDtypeStruct((CK, (nblk + 2) * W), x.dtype),
        ],
        interpret=interpret,
    )(blk, ks, x)
    lo = jnp.where(mlo > 0, lo, 0.0)
    hi = jnp.where(mhi > 0, hi, 0.0)
    return (lo + hi)[:, :E]


def _make_gather_kernel(TF, W, C, K):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, o_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(ulo_ref.dtype)
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
        locr = loc[None, :]
        hot_lo = jnp.where(iota == locr, 1.0, 0.0).astype(ulo_ref.dtype) \
            * validf[None, :]
        hot_hi = jnp.where(iota == locr - W, 1.0, 0.0) \
            .astype(ulo_ref.dtype) * validf[None, :]
        u = (onehot_dot(ulo_ref[...], hot_lo)
             + onehot_dot(uhi_ref[...], hot_hi))
        o_ref[...] = u.reshape(C, K, TF)

    return kernel


def gather_left_states(plan: AccumPlan, U, C: int, K: int):
    """U (C*K, E) -> (C, K, F): the left-element modal states of every
    face, i.e. Uv[:, :, el], via the same one-hot windows as the
    accumulation (2.6x the XLA rank-3 gather at 663k tets)."""
    CK = C * K
    TF, W = plan.TF, plan.W
    NBW = (plan.nblkL + 2) * W
    Upad = jnp.pad(U, ((0, 0), (0, NBW - U.shape[1])))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_gather_kernel(TF, W, C, K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(plan.ntileL,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t] + 1)),
            ],
            out_specs=pl.BlockSpec((C, K, TF), lambda t, blk: (0, 0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((C, K, plan.ntileL * TF), U.dtype),
        interpret=interpret,
    )(plan.blkL, plan.ksL, Upad, Upad)
    return out[:, :, :plan.F]


def accumulate_faces(plan: AccumPlan, contribL, contribR,
                     C: int = 0, K: int = 0):
    """contribL/R (C, K, F) or (rows, F) -> (rows, E) accumulated element
    contributions (rank-3 inputs are reshaped in-kernel in VMEM)."""
    cL = contribL
    cR = (contribR[:, :, plan.permR] if contribR.ndim == 3
          else contribR[:, plan.permR])
    accL = _one_pass(cL, plan.ksL, plan.blkL, plan.mloL, plan.mhiL,
                     plan.ntileL, plan.nblkL, plan.TF, plan.W, plan.E)
    accR = _one_pass(cR, plan.ksR, plan.blkR, plan.mloR, plan.mhiR,
                     plan.ntileR, plan.nblkR, plan.TF, plan.W, plan.E)
    return accL + accR
