"""Pallas TPU kernel: per-element neighbor cell-mean min/max bounds.

The Superbee limiter's bounds loop (reference src/PDE/Limiter.cpp:156
Superbee_P1: per element, min/max of cell averages over face neighbors
via esuel) is the DG step's last big XLA gather: at 663k tets the
4-neighbor `u0[:, esuelT]` gather costs ~17 ms per stage (~40% of the
fused step).

Design (v3 — two earlier one-hot/scan window designs lost to their own
overhead; see git history):

- elements are processed IN ORDER, W per tile; the u0 means of blocks
  t-1, t, t+1 sit in VMEM and the ~95% of neighbors that fall inside
  that 3W window (Hilbert-ordered elements, mesh/reorder.py) are read
  with `tpu.dynamic_gather` lane gathers (jnp.take_along_axis) — a few
  VPU ops per element, no HBM gather, no one-hot matmuls;
- far neighbors (~25-30% of elements have one at feasible window
  sizes: a 3W window covers a ~6-hex-wide cube and its surface is a
  third of its volume) ride ONE XLA gather laid out directly in the
  kernel's tile-padded order (no compact->padded expansion gathers —
  those cost more than the esuelT gather they replaced), are min/max-
  reduced in XLA, and are merged in-kernel through a small one-hot
  placement (unique targets per tile, so a sum-matmul places each
  value exactly);
- the output (2C, W) block is written once per tile in element order —
  no block revisits, no accumulation state.

Outputs umin/umax (C, E) include the element's own mean, matching the
reference's loop start at u0.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nbr", "fidx", "fmask", "fpos"],
    meta_fields=["E", "Ep", "W", "ntile", "FTE", "nef", "nsr"],
)
@dataclasses.dataclass(frozen=True)
class BoundsPlan:
    """Static tables for the neighbor-bounds pass.

    nbr   : (4, Ep) i32  global face-neighbor ids (-1 none/pad)
    fidx  : (nsr, ntile*FTE) i32  far-slot value-gather indices laid out
            directly in the kernel's tile-padded order (0 at pads); nsr
            is the max far-slot count of any element (measured 2 on
            Hilbert-ordered tet meshes at W=512 — a 4-row layout would
            double the stage's biggest XLA gather for nothing)
    fmask : (nsr, ntile*FTE)  1.0 where the far slot is real
    fpos  : (1, ntile*FTE) i32 tile-local element position (-1 pad)
    """

    nbr: jnp.ndarray
    fidx: jnp.ndarray
    fmask: jnp.ndarray
    fpos: jnp.ndarray
    E: int
    Ep: int
    W: int
    ntile: int
    FTE: int
    nef: int
    nsr: int = 4


def build_bounds_plan(geom, W: int = 512, force_FTE=None,
                      force_nsr=None) -> BoundsPlan:
    """Host-side plan from a DGGeom (uses its esuelT neighbor table).
    force_FTE/force_nsr pin the far-tile width / slot-row count for
    uniform stacked builds.  QUINOA_BOUNDS_W overrides the window for
    on-chip sweeps (the in-window select-chain cost is O((W/128)^2) per
    tile while the far-slot share grows as W shrinks)."""
    import os

    W = int(os.environ.get("QUINOA_BOUNDS_W", W))
    return _bounds_plan_from_nbr(np.asarray(geom.esuelT),
                                 np.asarray(geom.vol).dtype, W, force_FTE,
                                 force_nsr)


def _bounds_plan_from_nbr(nbr, dtype, W: int = 512,
                          force_FTE=None, force_nsr=None) -> BoundsPlan:
    nbr = np.asarray(nbr).astype(np.int64)  # (4, E)
    E = nbr.shape[1]
    ntile = max((E + W - 1) // W, 1)
    Ep = ntile * W
    e = np.arange(E)
    t = e // W
    valid = nbr >= 0
    near = valid & (nbr // W >= t - 1) & (nbr // W <= t + 1)
    far = valid & ~near

    nbrp = np.full((4, Ep), -1, np.int64)
    # far slots are masked out of the kernel's near path by the range
    # check on their local index, so they can stay in nbrp as-is
    nbrp[:, :E] = nbr

    # far elements (>= 1 far slot), laid out tile-padded: tile tt owns
    # columns [tt*FTE, tt*FTE + count(tt))
    ef = np.nonzero(far.any(axis=0))[0]
    nef = len(ef)
    ftile = ef // W
    counts = np.bincount(ftile, minlength=ntile)
    # Pallas block minor dims must be multiples of 128
    FTE = max(128, int(-(-(counts.max() if nef else 1) // 128) * 128))
    if force_FTE is not None:
        if force_FTE < FTE:
            raise ValueError(f"force_FTE {force_FTE} < required {FTE}")
        FTE = force_FTE
    NT = ntile * FTE
    # column of far element j: its rank within its tile
    col = (ftile * FTE + np.arange(nef)
           - np.concatenate([[0], np.cumsum(counts)])[ftile])
    # slot rows: compact the 4 per-face slots down to the max far-slot
    # count any element carries (the XLA value gather is the DG stage's
    # single biggest op at nsr=4; measured 4.44 ms/stage at 48^3 where
    # the real slots fill only 15% of the (4, NT) layout)
    cnts = far[:, ef].sum(axis=0) if nef else np.zeros(0, np.int64)
    nsr = max(1, int(cnts.max()) if nef else 1)
    if force_nsr is not None:
        if force_nsr < nsr:
            raise ValueError(f"force_nsr {force_nsr} < required {nsr}")
        nsr = force_nsr
    fidx = np.zeros((nsr, NT), np.int32)
    fmask = np.zeros((nsr, NT), dtype)
    fpos = np.full(NT, -1, np.int32)
    if nef:
        j_idx, a_idx = np.nonzero(far[:, ef].T)  # element-major slot list
        rank = np.concatenate([np.arange(c) for c in cnts]) \
            if len(j_idx) else np.zeros(0, np.int64)
        fidx[rank, col[j_idx]] = nbr[a_idx, ef[j_idx]]
        fmask[rank, col[j_idx]] = 1.0
    fpos[col] = ef - ftile * W

    return BoundsPlan(
        nbr=jnp.asarray(nbrp.astype(np.int32)),
        fidx=jnp.asarray(fidx),
        fmask=jnp.asarray(fmask),
        fpos=jnp.asarray(fpos.reshape(1, -1)),
        E=E, Ep=Ep, W=W, ntile=ntile, FTE=FTE, nef=nef, nsr=nsr,
    )


def _bounds_body(W, C, FTE, nbr_ref, um1_ref, u0_ref, up1_ref, fx_ref,
             fn_ref, fpos_ref):
    """Shared bounds computation: returns (vmax, vmin) each (C, W).
    Called by both the bounds-only kernel and the fused limit(+vol)
    kernel — a plain function, so no write-once output-ref tricks."""
    t = pl.program_id(0)
    dt_ = u0_ref.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

    self_u = u0_ref[...]                    # (C, W)
    vmax = self_u
    vmin = self_u
    blocks = (um1_ref[...], u0_ref[...], up1_ref[...])
    # Mosaic's tpu.dynamic_gather gathers within ONE vreg: source
    # and indices must both be a single 128-lane chunk (lowering
    # asserts indices.shape == source.shape + (1,)), so both the
    # output tile and the 3W window are walked in 128-lane chunks
    # with range-masked selects.
    SUB = 128
    for a in range(4):
        g = nbr_ref[a, :]                   # (W,) global id or -1
        loc = g - (t - 1) * W               # in [0, 3W) when near
        near = (loc >= 0) & (loc < 3 * W) & (g >= 0)
        vo = []
        vno = []
        for o in range(W // SUB):
            loc_o = jax.lax.slice(loc, (o * SUB,), ((o + 1) * SUB,))
            near_o = jax.lax.slice(near, (o * SUB,),
                                   ((o + 1) * SUB,))
            v = jnp.full((C, SUB), -BIG, dt_)
            vn = jnp.full((C, SUB), BIG, dt_)
            for b in range(3):
                blk = blocks[b]
                for s in range(W // SUB):
                    lb = loc_o - b * W - s * SUB
                    idx = jnp.clip(lb, 0, SUB - 1).astype(jnp.int32)
                    idx2 = jnp.broadcast_to(idx[None, :], (C, SUB))
                    sub = jax.lax.slice(blk, (0, s * SUB),
                                        (C, (s + 1) * SUB))
                    gb = jnp.take_along_axis(
                        sub, idx2, axis=1, mode="promise_in_bounds")
                    inb = ((lb >= 0) & (lb < SUB) & near_o)[None, :]
                    v = jnp.where(inb, gb, v)
                    vn = jnp.where(inb, gb, vn)
            vo.append(v)
            vno.append(vn)
        vmax = jnp.maximum(vmax, jnp.concatenate(vo, axis=1))
        vmin = jnp.minimum(vmin, jnp.concatenate(vno, axis=1))

    # merge the far-slot extrema (unique positions per tile: a
    # sum-matmul one-hot places each value exactly)
    fpos = fpos_ref[0, :]                   # (FTE,)
    pv = jnp.where(fpos >= 0, 1.0, 0.0).astype(dt_)
    iota = jax.lax.broadcasted_iota(jnp.int32, (FTE, W), 1)
    hot = jnp.where(fpos[:, None] == iota, 1.0, 0.0).astype(dt_) \
        * pv[:, None]
    rows = jnp.concatenate(
        [jnp.where(pv > 0, fx_ref[...], 0.0),
         jnp.where(pv > 0, fn_ref[...], 0.0),
         pv[None, :]], axis=0)              # (2C+1, FTE)
    from .mxu import onehot_dot

    tmp = onehot_dot(rows, hot)
    touched = tmp[2 * C:, :] > 0
    vmax = jnp.where(touched, jnp.maximum(vmax, tmp[:C]), vmax)
    vmin = jnp.where(touched, jnp.minimum(vmin, tmp[C:2 * C]), vmin)

    return vmax, vmin


def _make_kernel(W, C, FTE):
    def kernel(nbr_ref, um1_ref, u0_ref, up1_ref, fx_ref, fn_ref,
               fpos_ref, o_ref):
        vmax, vmin = _bounds_body(W, C, FTE, nbr_ref, um1_ref, u0_ref,
                                  up1_ref, fx_ref, fn_ref, fpos_ref)
        o_ref[...] = jnp.concatenate([vmax, vmin], axis=0)

    return kernel


def neighbor_mean_bounds(plan: BoundsPlan, u0, interpret=None):
    """u0 (C, E) cell means -> (umin, umax) each (C, E): min/max over
    the element's own mean and its interior face-neighbor means — the
    Superbee limiter's allowed bounds (Limiter.cpp:156-200) without the
    esuelT gather."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, E = u0.shape
    W, ntile, FTE = plan.W, plan.ntile, plan.FTE
    dt_ = u0.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

    # ONE far gather straight into the kernel's tile-padded layout
    # (the earlier compact-gather + expansion-gather chain cost more
    # than the esuelT gather it replaced), then a masked reduce
    NT = ntile * FTE
    fv = u0[:, plan.fidx.reshape(-1)].reshape(C, plan.nsr, NT)
    fx = jnp.where(plan.fmask > 0, fv, -BIG).max(axis=1)    # (C, NT)
    fn = jnp.where(plan.fmask > 0, fv, BIG).min(axis=1)

    # u0 padded with a leading zero block so tile t reads blocks
    # (t-1, t, t+1) as (t, t+1, t+2) without clamping
    u0p = jnp.pad(u0, ((0, 0), (W, plan.Ep + W - E)))

    out = pl.pallas_call(
        _make_kernel(W, C, FTE),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((4, W), lambda t: (0, t)),
            pl.BlockSpec((C, W), lambda t: (0, t)),
            pl.BlockSpec((C, W), lambda t: (0, t + 1)),
            pl.BlockSpec((C, W), lambda t: (0, t + 2)),
            pl.BlockSpec((C, FTE), lambda t: (0, t)),
            pl.BlockSpec((C, FTE), lambda t: (0, t)),
            pl.BlockSpec((1, FTE), lambda t: (0, t)),
        ],
        out_specs=pl.BlockSpec((2 * C, W), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((2 * C, plan.Ep), dt_),
        interpret=interpret,
    )(plan.nbr, u0p, u0p, u0p, fx, fn, plan.fpos)

    return out[C:, :E], out[:C, :E]


def _make_bounds_limit_kernel(W, C, K, FTE, Bself, beta_lim,
                              vol=None, rk=None, phi_mxu=False):
    """Bounds + Superbee phi + P1-mode scaling in ONE window pass: the
    separate XLA phi chain (12 Gauss evaluations over (C, E) slabs with
    HBM round trips between the bounds kernel and the mode multiply)
    runs on the means already sitting in VMEM (Limiter.cpp:154-317).

    With vol=(system, B_vol, wdB) the kernel ALSO emits the flux
    volume integral evaluated on the limited state it just produced
    (dg_rhs's volume einsum chain, Integrate/Volume.cpp) — the step's
    only remaining XLA compute pass on the modal slabs.

    With rk=(rk0, rk1, mnorm) the kernel ALSO applies the PREVIOUS RK
    stage's update in its prologue (DG.cpp:1479-1488): it takes the
    anchor un, the previous limited state u, the previous rhs r, and
    dt/vol, and limits

        u_new = rk0*un + rk1*(u + (dt/vol) * r / mnorm_k)

    so the (C*K, E) RK-update slab of stages 0-1 is never materialized
    by XLA between the face pass and the next limit — the neighbor
    MEANS the bounds read are the cheap (C, E) XLA update of the k=0
    rows only (superbee_limit_window's rk_update)."""
    G = Bself.shape[1]

    def kernel(nbr_ref, um1_ref, u0_ref, up1_ref, fx_ref, fn_ref,
               fpos_ref, uf_ref, *rest):
        rest = list(rest)
        if phi_mxu:
            bblk_ref = rest.pop(0)
        if rk is not None:
            un_ref, r_ref, dov_ref = rest[:3]
            rest = rest[3:]
        if vol is not None:
            jac_ref, vole_ref, o_ref, rv_ref = rest
        else:
            (o_ref,) = rest
        vmax, vmin = _bounds_body(W, C, FTE, nbr_ref, um1_ref, u0_ref,
                                  up1_ref, fx_ref, fn_ref, fpos_ref)

        dt_ = u0_ref.dtype
        uf = uf_ref[...]                        # (C*K, W) full state
        u0 = u0_ref[...]                        # (C, W) means

        def _row2(a, k):
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(a, k, k + 1, axis=0), (0,))

        if rk is not None:
            rk0, rk1, mnorm = rk
            un_ = un_ref[...]
            r_ = r_ref[...]
            dov = _row2(dov_ref[...], 0)        # (W,) dt/vol (0 at pads)
            newrows = [
                rk0 * _row2(un_, c * K + k)
                + rk1 * (_row2(uf, c * K + k)
                         + _row2(r_, c * K + k) * dov
                         * (1.0 / float(mnorm[k])))
                for c in range(C) for k in range(K)
            ]

            def row(k):
                return newrows[k]
        else:
            def row(k):
                return _row2(uf, k)

        eps = 1.0e-14
        one = jnp.ones_like(u0)
        phi = one
        # phi_mxu: evaluate ALL 4*G face-point states with ONE
        # (12C, CK) x (CK, W) MXU dot (the Bself table rides in as a
        # kernel input — array constants can't be captured) instead of
        # 12 per-point K-term FMA row chains; the per-point select
        # logic below is unchanged.
        if phi_mxu:
            ufstack = (jnp.stack([row(i) for i in range(C * K)])
                       if rk is not None else uf)
            G4C = 4 * G * C
            bb = jax.lax.slice(bblk_ref[...], (0, 0), (G4C, C * K))
            Sall = jax.lax.dot(bb, ufstack,
                               precision="highest")  # (4*G*C, W)
        for lf in range(4):
            for g in range(G):
                if phi_mxu:
                    p = lf * G + g
                    state = jax.lax.slice_in_dim(
                        Sall, p * C, (p + 1) * C, axis=0)
                else:
                    state = jnp.stack([
                        sum(float(Bself[lf, g, k]) * row(c * K + k)
                            for k in range(K))
                        for c in range(C)
                    ])
                uNeg = state - u0
                up = jnp.minimum(
                    1.0, (vmax - u0)
                    / (2.0 * jnp.where(uNeg > eps, uNeg, 1.0)))
                dn = jnp.minimum(
                    1.0, (vmin - u0)
                    / (2.0 * jnp.where(uNeg < -eps, uNeg, 1.0)))
                phi_gp = jnp.where(uNeg > eps, up,
                                   jnp.where(uNeg < -eps, dn, one))
                phi_gp = jnp.maximum(
                    0.0,
                    jnp.maximum(jnp.minimum(beta_lim * phi_gp, 1.0),
                                jnp.minimum(phi_gp, beta_lim)))
                phi = jnp.minimum(phi, phi_gp)

        rows = []
        for c in range(C):
            phic = jax.lax.squeeze(
                jax.lax.slice_in_dim(phi, c, c + 1, axis=0), (0,))
            for k in range(K):
                r = row(c * K + k)
                rows.append(r * phic if 1 <= k < 4 else r)
        o_ref[...] = jnp.stack(rows)

        if vol is not None:
            system, Bvol, wdB = vol
            Gv = Bvol.shape[0]
            jac = jac_ref[...]                   # (9, W): jacInv[m,j]
            vole = vole_ref[...]                 # (1, W): vol*emask

            def jrow(m, j):
                return jax.lax.squeeze(
                    jax.lax.slice_in_dim(jac, 3 * m + j, 3 * m + j + 1,
                                         axis=0), (0,))

            def lrow(i):
                return rows[i]                   # limited state rows

            Rv = [jnp.zeros_like(rows[0]) for _ in range(C * K)]
            for g in range(Gv):
                state = jnp.stack([
                    sum(float(Bvol[g, k]) * lrow(c * K + k)
                        for k in range(K))
                    for c in range(C)
                ])                               # (C, W)
                Fj = system.flux_cols(state, None, 0.0)  # [3] of (C, W)
                for m in range(3):
                    fref = sum(Fj[j] * jrow(m, j)[None] for j in range(3))
                    for k in range(K):
                        w = float(wdB[g, k, m])
                        if w == 0.0:
                            continue
                        for c in range(C):
                            fc = jax.lax.squeeze(
                                jax.lax.slice_in_dim(fref, c, c + 1,
                                                     axis=0), (0,))
                            Rv[c * K + k] = Rv[c * K + k] + w * fc
            ve = jax.lax.squeeze(
                jax.lax.slice_in_dim(vole, 0, 1, axis=0), (0,))
            rv_ref[...] = jnp.stack(Rv) * ve[None, :]

    return kernel


def superbee_limit_window(plan: BoundsPlan, geom, U, C,
                          beta_lim: float = 2.0, interpret=None,
                          emit_vol=False, system=None, rk_update=None):
    """U (C*K, E) -> limited U: neighbor bounds + Superbee coefficient +
    P1-dof scaling fused into the bounds window pass (headline path:
    dofmask-free DG(P1)); matches superbee_p1(geom, U, None, C,
    bounds=neighbor_mean_bounds(...)) to FMA-contraction tolerance.

    emit_vol=True (coordinate-free, source-free systems only) also
    returns the flux volume integral on the limited state — dg_rhs
    consumes it as vol_rhs and skips its own volume einsum chain.

    rk_update=(un, r, dt, rk0, rk1) limits the RK-UPDATED state
    rk0*un + rk1*(U + dt*r*minv), computed in the kernel prologue from
    block-local operands (U is then the previous stage's LIMITED
    state); only the (C, E) MEANS are RK-updated XLA-side for the
    neighbor-window blocks and far gathers."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K = geom.ndof
    E = U.shape[1]
    W, ntile, FTE = plan.W, plan.ntile, plan.FTE
    dt_ = U.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

    mnorm = np.asarray(geom.tables["mnorm"])
    rk = None
    u0 = U.reshape(C, K, -1)[:, 0, :]
    if rk_update is not None:
        un, r, dtt, rk0, rk1 = rk_update
        dov = (dtt / geom.vol).astype(dt_)[None, :]       # (1, E)
        un0 = un.reshape(C, K, -1)[:, 0, :]
        r0 = r.reshape(C, K, -1)[:, 0, :]
        u0 = rk0 * un0 + rk1 * (u0 + r0 * dov
                                * (1.0 / float(mnorm[0])))
        rk = (float(rk0), float(rk1), mnorm)
    NT = ntile * FTE
    fv = u0[:, plan.fidx.reshape(-1)].reshape(C, plan.nsr, NT)
    fx = jnp.where(plan.fmask > 0, fv, -BIG).max(axis=1)
    fn = jnp.where(plan.fmask > 0, fv, BIG).min(axis=1)
    u0p = jnp.pad(u0, ((0, 0), (W, plan.Ep + W - E)))
    Ufp = jnp.pad(U, ((0, 0), (0, plan.Ep - E)))

    Bself = np.asarray(geom.tables["B_selfface"])
    in_specs = [
        pl.BlockSpec((4, W), lambda t: (0, t)),
        pl.BlockSpec((C, W), lambda t: (0, t)),
        pl.BlockSpec((C, W), lambda t: (0, t + 1)),
        pl.BlockSpec((C, W), lambda t: (0, t + 2)),
        pl.BlockSpec((C, FTE), lambda t: (0, t)),
        pl.BlockSpec((C, FTE), lambda t: (0, t)),
        pl.BlockSpec((1, FTE), lambda t: (0, t)),
        pl.BlockSpec((C * K, W), lambda t: (0, t)),
    ]
    args = [plan.nbr, u0p, u0p, u0p, fx, fn, plan.fpos, Ufp]
    import os as _os

    phi_mxu = _os.environ.get("QUINOA_PHI_MXU", "0") == "1"
    if phi_mxu:
        # block-diagonal (4G*C, C*K) Bself table: row (p*C + c) holds
        # Bself[lf, g, :] at columns [c*K, (c+1)*K), p = lf*G + g;
        # padded to (8, 128)-aligned tiles for the block transfer (the
        # kernel slices back to the true extents before the dot)
        G4 = Bself.shape[0] * Bself.shape[1]
        Rp = -(-(G4 * C) // 8) * 8
        Cp = max(128, -(-(C * K) // 128) * 128)
        bblk = np.zeros((Rp, Cp), dt_)
        Bs2 = Bself.reshape(G4, K)
        for p in range(G4):
            for c in range(C):
                bblk[p * C + c, c * K:(c + 1) * K] = Bs2[p]
        in_specs.append(pl.BlockSpec((Rp, Cp), lambda t: (0, 0)))
        args.append(jnp.asarray(bblk))
    if rk is not None:
        in_specs += [
            pl.BlockSpec((C * K, W), lambda t: (0, t)),   # anchor un
            pl.BlockSpec((C * K, W), lambda t: (0, t)),   # prev rhs r
            pl.BlockSpec((1, W), lambda t: (0, t)),       # dt/vol
        ]
        args += [
            jnp.pad(un, ((0, 0), (0, plan.Ep - E))),
            jnp.pad(r, ((0, 0), (0, plan.Ep - E))),
            jnp.pad(dov, ((0, 0), (0, plan.Ep - E))),
        ]
    vol = None
    out_specs = pl.BlockSpec((C * K, W), lambda t: (0, t))
    out_shape = jax.ShapeDtypeStruct((C * K, plan.Ep), dt_)
    if emit_vol:
        tb = geom.tables
        wdB = np.asarray(tb["w_vol"])[:, None, None] \
            * np.asarray(tb["dBdxi_vol"])
        vol = (system, np.asarray(tb["B_vol"]), wdB)
        jacp = jnp.pad(geom.jacInv.reshape(9, -1).astype(dt_),
                       ((0, 0), (0, plan.Ep - E)))
        volep = jnp.pad((geom.vol * geom.emask).astype(dt_)[None],
                        ((0, 0), (0, plan.Ep - E)))
        in_specs += [
            pl.BlockSpec((9, W), lambda t: (0, t)),
            pl.BlockSpec((1, W), lambda t: (0, t)),
        ]
        args += [jacp, volep]
        out_specs = [out_specs,
                     pl.BlockSpec((C * K, W), lambda t: (0, t))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((C * K, plan.Ep), dt_)]
    out = pl.pallas_call(
        _make_bounds_limit_kernel(W, C, K, FTE, Bself, beta_lim,
                                  vol=vol, rk=rk, phi_mxu=phi_mxu),
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if emit_vol:
        return out[0][:, :E], out[1][:, :E]
    return out[:, :E]


def maybe_fused_limit(system, geom, u, dofmask, bounds_plan, fused,
                      limiter, rk_update=None):
    """The env-gated fused limit(+volume) dispatch shared by the
    single-chip and SPMD DG solvers (one definition, so the gates can
    never drift apart).  Returns (u_limited, vol_rhs_or_None), or None
    when the preconditions do not hold and the caller must fall back
    to the split bounds-kernel + XLA-phi path.

    rk_update forwards to superbee_limit_window: the caller's deferred
    previous-stage RK update rides the kernel prologue."""
    import os

    # Both kernels default-on since the on-chip A/B stack (v5e, 48^3
    # Sedov dgp1): base 6.39M -> +limit 6.57M -> +vol 6.99M updates/s;
    # QUINOA_LIMIT_IN_KERNEL=0 / QUINOA_VOL_IN_KERNEL=0 restore the
    # split bounds-kernel + XLA-phi / XLA-volume paths
    if (bounds_plan is None or dofmask is not None
            or limiter != "superbeep1" or geom.ndof < 4
            or os.environ.get("QUINOA_LIMIT_IN_KERNEL", "1") != "1"):
        return None
    C = system.ncomp
    emit_vol = (
        fused
        and os.environ.get("QUINOA_VOL_IN_KERNEL", "1") == "1"
        # the kernel evaluates flux_cols(state, None, 0.0): only safe
        # when the system declares its flux gp- AND t-independent
        and getattr(system, "coord_free_flux", False)
        and not getattr(system, "has_src", True)
    )
    if emit_vol:
        return superbee_limit_window(bounds_plan, geom, u, C,
                                     emit_vol=True, system=system,
                                     rk_update=rk_update)
    return superbee_limit_window(bounds_plan, geom, u, C,
                                 rk_update=rk_update), None


def build_bounds_plan_stacked(sharded_geom, W: int = 512) -> BoundsPlan:
    """Per-shard bounds plans at a common FTE, stacked with a leading
    shard axis (local element ids incl. ghosts; El uniform across
    shards, so only the far-tile width needs forcing)."""
    nbrs = np.asarray(sharded_geom.esuelT)        # (S, 4, El)
    dtype = np.asarray(sharded_geom.vol).dtype
    S = nbrs.shape[0]
    fit = [_bounds_plan_from_nbr(nbrs[s], dtype, W) for s in range(S)]
    FTE = max(p.FTE for p in fit)
    nsr = max(p.nsr for p in fit)
    plans = [_bounds_plan_from_nbr(nbrs[s], dtype, W, force_FTE=FTE,
                                   force_nsr=nsr)
             for s in range(S)]

    def st(name):
        return jnp.asarray(np.stack(
            [np.asarray(getattr(p, name)) for p in plans]))

    p0 = plans[0]
    return BoundsPlan(
        nbr=st("nbr"), fidx=st("fidx"), fmask=st("fmask"),
        fpos=st("fpos"), E=p0.E, Ep=p0.Ep, W=p0.W, ntile=p0.ntile,
        FTE=FTE, nef=max(p.nef for p in plans), nsr=nsr,
    )
