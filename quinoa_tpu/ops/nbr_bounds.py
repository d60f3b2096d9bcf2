"""Pallas TPU kernels: per-element neighbor cell-mean min/max bounds.

The Superbee limiter's bounds loop (reference src/PDE/Limiter.cpp:156
Superbee_P1: for each element, min/max of the cell averages over its
face neighbors via esuel) is the DG step's last big XLA gather: at 663k
tets the 4-neighbor `u0[:, esuelT]` gather costs ~20 ms per stage (~44%
of the whole step), and the XLA gather cost is flat for <=16 rows — no
batching helps (ROADMAP).

This pass reuses the fused face plan's near/far adjacency instead:
every (el, er) neighbor pair IS a face the plan already orders.

- NEAR faces (er in el's W-block, 67-84% on SFC meshes): one kernel
  window-gathers both cell means via one-hot dots and min/max-
  accumulates each side's mean at the OTHER side's element — no HBM
  gather at all.
- FAR faces: two value gathers of C rows each (u0[:, erF] in el-order,
  u0[:, elFR] in er-order — a fraction of the full esuelT gather's
  columns), then the same window min/max accumulation over the far and
  far-R streams.

Accumulation is a masked max/min over the (TF, W) one-hot windows
(max doesn't ride the MXU like the rhs sums, but C*TF*W per tile is
cheap VPU work).  Outputs umin/umax (C, E) INCLUDE the element's own
mean, matching the reference's loop start at u0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .face_accum import AccumPlan


def _acc_bounds(xlo_ref, xhi_ref, nlo_ref, nhi_ref, vals, masks, BIG):
    """Min/max-accumulate vals (C, TF) into the lo/hi window blocks
    through 0/1 float masks (TF, W) — one (mask_lo, mask_hi) pair per
    value set.  (Mosaic can't minor-insert on i1 vectors, so masks stay
    float and the predicate is `> 0` on the 2-D mask.)"""
    for (mlo, mhi) in masks:
        for ref, m in ((xlo_ref, mlo), (xhi_ref, mhi)):
            cand = jnp.where((m > 0)[None], vals[:, :, None], -BIG) \
                .max(axis=1)
            ref[...] = jnp.maximum(ref[...], cand)
        for ref, m in ((nlo_ref, mlo), (nhi_ref, mhi)):
            cand = jnp.where((m > 0)[None], vals[:, :, None], BIG) \
                .min(axis=1)
            ref[...] = jnp.minimum(ref[...], cand)


def _make_near_kernel(TF, W, C):
    def kernel(blk_ref, ks_ref, ker_ref, ulo_ref, uhi_ref,
               xlo_ref, xhi_ref, nlo_ref, nhi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])
        dt_ = ulo_ref.dtype
        BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

        @pl.when(fresh)
        def _():
            xlo_ref[...] = jnp.full_like(xlo_ref, -BIG)
            xhi_ref[...] = jnp.full_like(xhi_ref, -BIG)
            nlo_ref[...] = jnp.full_like(nlo_ref, BIG)
            nhi_ref[...] = jnp.full_like(nhi_ref, BIG)

        ks = ks_ref[0, :]
        ker = ker_ref[0, :]
        loc = ks - b * W
        locr = ker - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        validr = jnp.where(ker >= 0, 1.0, 0.0).astype(dt_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        hot_lo = jnp.where(loc[:, None] == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hot_hi = jnp.where((loc - W)[:, None] == iota, 1.0, 0.0) \
            .astype(dt_) * validf[:, None]
        hot_rlo = jnp.where(locr[:, None] == iota, 1.0, 0.0).astype(dt_) \
            * validr[:, None]
        hot_rhi = jnp.where((locr - W)[:, None] == iota, 1.0, 0.0) \
            .astype(dt_) * validr[:, None]

        def dotT(a, m):
            return jax.lax.dot_general(
                a, m, (((1,), (1,)), ((), ())), precision="highest")

        meanL = dotT(ulo_ref[...], hot_lo) + dotT(uhi_ref[...], hot_hi)
        meanR = dotT(ulo_ref[...], hot_rlo) + dotT(uhi_ref[...], hot_rhi)

        # at el accumulate er's mean (interior faces only: ker=-1 for
        # boundary faces matches the reference's esuel<0 skip); at er
        # accumulate el's mean
        _acc_bounds(
            xlo_ref, xhi_ref, nlo_ref, nhi_ref, meanR,
            [(hot_lo * validr[:, None], hot_hi * validr[:, None])], BIG)
        _acc_bounds(
            xlo_ref, xhi_ref, nlo_ref, nhi_ref, meanL,
            [(hot_rlo, hot_rhi)], BIG)

    return kernel


def _make_far_kernel(TF, W, C):
    """Value-carrying variant: vals (C, TF) are pre-gathered neighbor
    means; accumulate at the ks targets."""

    def kernel(blk_ref, ks_ref, v_ref, xlo_ref, xhi_ref, nlo_ref, nhi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])
        dt_ = v_ref.dtype
        BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

        @pl.when(fresh)
        def _():
            xlo_ref[...] = jnp.full_like(xlo_ref, -BIG)
            xhi_ref[...] = jnp.full_like(xhi_ref, -BIG)
            nlo_ref[...] = jnp.full_like(nlo_ref, BIG)
            nhi_ref[...] = jnp.full_like(nhi_ref, BIG)

        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        hot_lo = jnp.where(loc[:, None] == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hot_hi = jnp.where((loc - W)[:, None] == iota, 1.0, 0.0) \
            .astype(dt_) * validf[:, None]
        _acc_bounds(xlo_ref, xhi_ref, nlo_ref, nhi_ref, v_ref[...],
                    [(hot_lo, hot_hi)], BIG)

    return kernel


def _bounds_call(kernel, ntile, nblk, TF, W, C, E, dtype, prefetch_blk,
                 inputs, in_specs, interpret):
    NBW = (nblk + 2) * W
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntile,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t] + 1)),
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((C, W), lambda t, blk: (0, blk[t] + 1)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((C, NBW), dtype)] * 4,
        interpret=interpret,
    )(prefetch_blk, *inputs)
    return outs  # xlo, xhi, nlo, nhi (unvisited blocks hold stale data)


def _combine(xlo, xhi, nlo, nhi, mlo, mhi, E, BIG):
    umax = jnp.maximum(jnp.where(mlo > 0, xlo, -BIG),
                       jnp.where(mhi > 0, xhi, -BIG))[:, :E]
    umin = jnp.minimum(jnp.where(mlo > 0, nlo, BIG),
                       jnp.where(mhi > 0, nhi, BIG))[:, :E]
    return umin, umax


def neighbor_mean_bounds(plan: AccumPlan, u0, interpret=None):
    """u0 (C, E) cell means -> (umin, umax) each (C, E): min/max over
    the element's own mean and its interior face-neighbor means — the
    Superbee limiter's allowed bounds (Limiter.cpp:156-200) without the
    esuelT gather."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fp = plan.fused
    C, E = u0.shape
    dt_ = u0.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2
    TF = plan.TF

    def padTo(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1])))

    # near stream: both sides in-window
    st = fp.near
    NBWn = (st.nblk + 2) * st.W
    u0p = padTo(u0, NBWn)
    outs = _bounds_call(
        _make_near_kernel(TF, st.W, C), st.ntile, st.nblk, TF, st.W, C, E,
        dt_, st.blk,
        [st.ks, st.ker, u0p, u0p],
        [
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
            pl.BlockSpec((C, st.W), lambda t, blk: (0, blk[t])),
            pl.BlockSpec((C, st.W), lambda t, blk: (0, blk[t] + 1)),
        ],
        interpret,
    )
    umin, umax = _combine(*outs, st.mlo, st.mhi, E, BIG)

    # far stream, el side: pre-gathered er means accumulated at el
    st = fp.far
    valsR = u0[:, fp.erF]                       # (C, FpF)
    outs = _bounds_call(
        _make_far_kernel(TF, st.W, C), st.ntile, st.nblk, TF, st.W, C, E,
        dt_, st.blk,
        [st.ks, valsR],
        [
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
            pl.BlockSpec((C, TF), lambda t, blk: (0, t)),
        ],
        interpret,
    )
    fmin, fmax = _combine(*outs, st.mlo, st.mhi, E, BIG)
    umin, umax = jnp.minimum(umin, fmin), jnp.maximum(umax, fmax)

    # far stream, er side: pre-gathered el means (er-sorted) at er
    valsL = u0[:, fp.elFR]                      # (C, FpRF)
    outs = _bounds_call(
        _make_far_kernel(TF, fp.WRF, C), fp.ntileRF, fp.nblkRF, TF,
        fp.WRF, C, E, dt_, fp.blkRF,
        [fp.ksRF, valsL],
        [
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
            pl.BlockSpec((C, TF), lambda t, blk: (0, t)),
        ],
        interpret,
    )
    rmin, rmax = _combine(*outs, fp.mloRF, fp.mhiRF, E, BIG)
    umin, umax = jnp.minimum(umin, rmin), jnp.maximum(umax, rmax)

    # include the element's own mean (the reference loop starts at u0)
    return jnp.minimum(umin, u0), jnp.maximum(umax, u0)
