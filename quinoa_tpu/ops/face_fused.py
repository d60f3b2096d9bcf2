"""Pallas TPU kernel: the FUSED DG face pass.

One kernel over el-sorted face tiles runs the entire surface integral
in VMEM (the ROADMAP lever; reference hot loop src/Inciter/DG.cpp:
1432-1508 + src/PDE/Integrate/Surface.cpp:32):

  per tile of TF faces (targeting one aligned element window):
    - gather LEFT modal states from the element window via one-hot MXU
      matmuls (no HBM gather);
    - evaluate the Dubiner basis at the face Gauss points (left + right)
      from the xi tables;
    - form face states, apply ghost/BC states, evaluate the Riemann flux
      (system.bc_state / system.riemann trace INSIDE the kernel);
    - contract contributions against the weighted basis;
    - accumulate left-side contributions into the element window
      (one-hot MXU matmuls, fresh-block zeroing as ops.face_accum);
    - write right-side contributions out for the er-sorted second pass
      (ops.face_accum._one_pass).

Separately materialized in the XLA path this costs ~6 HBM round trips
of (C,G,F)/(C,K,F) slabs (~150 ms per rhs at 663k tets); fused it is
one read of the static face tables + one window-gather + one write.

Supports the coordinate-free face path only (face_gp=False: no BC
samples coordinates and the flux doesn't either — the compflow case);
dg_rhs falls back to the unfused path otherwise.

The optional charvel output additionally emits the dt face sweep's
wt-weighted max characteristic speed per face (DG.cpp:1361-1430), so
the stage-0 time-step computation reuses the same face states instead
of re-running its own gather+basis pass (dg_dt's isolated cost: 302 ms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .basis import eval_basis_cm
from .face_accum import AccumPlan, _one_pass
from .mxu import onehot_dot, onehot_dotT


def _use_lane_gather():
    import os

    # DEFAULT ON since the round-5 on-chip A/B (v5e, 48^3 Sedov dgp1):
    # 11.61M vs 11.38M cell-updates/s with an identical L2 trajectory;
    # QUINOA_LANE_GATHER=0 restores the one-hot gather masks
    return os.environ.get("QUINOA_LANE_GATHER", "1") == "1"


def _lane_window_gather(blocks, loc, valid, TF, W, dt_):
    """In-window gather via `tpu.dynamic_gather` lane gathers:
    out[:, f] = window[:, loc[f]] for loc in [0, len(blocks)*W), zero
    where ~valid — the QUINOA_LANE_GATHER alternative to the one-hot
    gather masks + MXU dots (mask building is the face kernels'
    dominant VPU cost; the ACCUMULATION direction keeps the one-hot
    scheme, there being no scatter analog of dynamic_gather).  Source
    and index vregs must be single 128-lane chunks (Mosaic lowering
    restriction; same chunked select walk as nbr_bounds._bounds_body).
    """
    SUB = 128
    R = blocks[0].shape[0]
    outs = []
    for o in range(TF // SUB):
        loc_o = jax.lax.slice(loc, (o * SUB,), ((o + 1) * SUB,))
        val_o = jax.lax.slice(valid, (o * SUB,), ((o + 1) * SUB,))
        acc = jnp.zeros((R, SUB), dt_)
        for b, blk in enumerate(blocks):
            for s in range(W // SUB):
                lb = loc_o - b * W - s * SUB
                idx = jnp.clip(lb, 0, SUB - 1).astype(jnp.int32)
                idx2 = jnp.broadcast_to(idx[None, :], (R, SUB))
                sub = jax.lax.slice(blk, (0, s * SUB),
                                    (R, (s + 1) * SUB))
                gb = jnp.take_along_axis(sub, idx2, axis=1,
                                         mode="promise_in_bounds")
                inb = ((lb >= 0) & (lb < SUB) & (val_o > 0))[None, :]
                acc = jnp.where(inb, gb, acc)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _make_fused_kernel(system, TF, W, C, K, G, wface, emit_charvel):
    from ..pde.dg import BC_INTERIOR

    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, uvr_ref, xil_ref,
               xir_ref, fn_ref, fa_ref, bt_ref, lo_ref, hi_ref, cr_ref,
               *maybe_mx):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        dt_ = ulo_ref.dtype
        ks = ks_ref[0, :]                       # (TF,)
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)

        # ---- one-hot window maps, shared by gather and accumulation ----
        # scatter masks are (TF, W); the gather direction builds the
        # TRANSPOSED (W, TF) masks from its own iota (same compare cost)
        # because Mosaic only lowers the bf16 split on [1],[0]-contracted
        # matmuls (ops/mxu.py)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        hot_lo = jnp.where(locc == iota_a, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hot_hi = jnp.where(locc - W == iota_a, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
        locr_g = loc[None, :]
        hot_loT = jnp.where(iota_g == locr_g, 1.0, 0.0).astype(dt_) \
            * validf[None, :]
        hot_hiT = jnp.where(iota_g == locr_g - W, 1.0, 0.0).astype(dt_) \
            * validf[None, :]

        UvL = (onehot_dot(ulo_ref[...], hot_loT)
               + onehot_dot(uhi_ref[...], hot_hiT))
        UvL = UvL.reshape(C, K, TF)
        UvR = uvr_ref[...].reshape(C, K, TF)

        # ---- basis at face Gauss points ----
        xi_l = xil_ref[...].reshape(3, G, TF)
        xi_r = xir_ref[...].reshape(3, G, TF)
        B_l = eval_basis_cm(K, xi_l)            # (K,G,TF)
        B_r = eval_basis_cm(K, xi_r)

        # Mosaic lowers mixed int/newaxis indexing on rank-3 arrays to an
        # unsupported 3-D gather; use explicit static slices instead
        def row3(a, k):
            # a (A,B,TF) -> a[k] as (B,TF) via static slice
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(a, k, k + 1, axis=0), (0,))

        def dof3(a, k):
            # a (C,K,TF) -> a[:, k] as (C,1,TF) via static slice
            return jax.lax.slice_in_dim(a, k, k + 1, axis=1)

        sL = sum(row3(B_l, k)[None] * dof3(UvL, k) for k in range(K))
        sR = sum(row3(B_r, k)[None] * dof3(UvR, k) for k in range(K))
        # pad faces carry zero states -> 0/0 in the flux; NaN times the
        # zero quadrature weight still poisons the MXU accumulation, so
        # substitute a finite unit state (weights zero it out)
        vf3 = validf[None, None, :] > 0
        sL = jnp.where(vf3, sL, 1.0)
        sR = jnp.where(vf3, sR, 1.0)

        # ---- BC ghosts + Riemann flux (coordinate-free path) ----
        fnf = fn_ref[...][:, None, :]           # (3,1,TF)
        bt = bt_ref[...]                        # (1,TF) int32
        interior = (bt == BC_INTERIOR)[:, None, :]  # (1,1,TF)
        sR = jnp.where(interior, sR, system.bc_state(bt[:, None, :], sL,
                                                     fnf, None, 0.0))
        fl = system.riemann(fnf, sL, sR, None, 0.0)  # (C,G,TF)

        fa = jax.lax.squeeze(fa_ref[...], (0,)) * validf  # (TF,)
        # Gauss weights are baked in as python scalars (array constants
        # cannot be captured by a pallas kernel)
        wt = jnp.stack([float(wface[g]) * fa for g in range(G)])  # (G,TF)
        wfl = fl * wt[None]

        rowsL = [
            -(row3(B_l, k) * row3(wfl, c)).sum(0)  # (TF,)
            for c in range(C) for k in range(K)
        ]
        contribL = jnp.stack(rowsL)             # (CK,TF)
        # emit the WEIGHTED FLUX (C*G rows) for the R pass, not the
        # (C*K) contributions: the er-order runtime permute outside
        # triples in cost above 16 rows, and the B_r contraction moves
        # into the R-pass kernel (xi_r is static, permuted at plan
        # build)
        cr_ref[...] = wfl.reshape(C * G, TF)

        # ---- accumulate left contributions into the window (MXU) ----
        lo_ref[...] += onehot_dot(contribL, hot_lo)
        hi_ref[...] += onehot_dot(contribL, hot_hi)

        if emit_charvel:
            vl = system.charvel(sL, fnf, None)   # (G,TF)
            vr = system.charvel(sR, fnf, None)
            mx = (wt * jnp.where(interior[0], jnp.maximum(vl, vr), vl)
                  ).sum(0)
            maybe_mx[0][...] = mx[None, :]

    return kernel


def _make_basis_accum_kernel(TF, W, C, K, G):
    """R-side pass: contract the er-sorted weighted flux against B_r
    evaluated from the er-sorted static Gauss coords, then window-
    accumulate (the one-hot scheme of face_accum._make_kernel)."""

    def kernel(blk_ref, ks_ref, xir_ref, wfl_ref, lo_ref, hi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        dt_ = wfl_ref.dtype
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)

        xi_r = xir_ref[...].reshape(3, G, TF)
        B_r = eval_basis_cm(K, xi_r)            # (K,G,TF)
        wfl = wfl_ref[...].reshape(C, G, TF)

        def row3(a, k):
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(a, k, k + 1, axis=0), (0,))

        x = jnp.stack([
            (row3(B_r, k) * row3(wfl, c)).sum(0)
            for c in range(C) for k in range(K)
        ])                                      # (CK,TF)

        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)

    return kernel


def basis_accum_pass(plan: AccumPlan, wflR, C, K, G, interpret=None):
    """wflR (C*G, F) er-sorted weighted flux -> (C*K, E) accumulated
    right-side contributions."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    TF, W = plan.TF, plan.W
    CK = C * K
    Fp = plan.ntileR * TF
    if wflR.shape[-1] < Fp:
        wflR = jnp.pad(wflR, ((0, 0), (0, Fp - wflR.shape[-1])))
    nblk = plan.nblkR
    lo, hi = pl.pallas_call(
        _make_basis_accum_kernel(TF, W, C, K, G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(plan.ntileR,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((3 * G, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((C * G, TF), lambda t, blk: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t] + 1)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((CK, (nblk + 2) * W), wflR.dtype),
            jax.ShapeDtypeStruct((CK, (nblk + 2) * W), wflR.dtype),
        ],
        interpret=interpret,
    )(plan.blkR, plan.ksR, plan.xirR, wflR)
    lo = jnp.where(plan.mloR > 0, lo, 0.0)
    hi = jnp.where(plan.mhiR > 0, hi, 0.0)
    return (lo + hi)[:, :plan.E]


def fused_face_pass(system, geom, plan: AccumPlan, U, emit_charvel=False,
                    interpret=None, _debug_contrib=False):
    """Full DG surface integral via the fused kernel.

    U (C*K, E) -> (C*K, E) accumulated face contributions; with
    emit_charvel also returns mx (F,), the wt-weighted max characteristic
    speed per face for the dt sweep.

    interpret=None auto-selects Pallas interpret mode off-TPU, so the
    SPMD solvers can run the same fused path on the virtual CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = system.ncomp
    K = geom.ndof
    G = np.asarray(geom.tables["w_face"]).shape[0]
    CK = C * K
    TF, W = plan.TF, plan.W
    Fp = plan.ntileL * TF
    F = plan.F
    dt_ = U.dtype

    # pre-gather right states (XLA): er targets are unbounded for
    # el-sorted tiles, so this one gather stays outside the kernel
    UvR = U.reshape(C, K, -1)[:, :, geom.er].reshape(CK, F)

    def padF(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Fp - x.shape[-1])])

    xil = padF(geom.xi_l.reshape(3 * G, F).astype(dt_))
    xir = padF(geom.xi_r.reshape(3 * G, F).astype(dt_))
    fn = padF(geom.fn.astype(dt_))
    fa = padF((geom.farea * geom.fmask).astype(dt_)[None, :])
    bt = padF(geom.bctype[None, :])
    UvRp = padF(UvR)

    nblk = plan.nblkL
    NBW = (nblk + 2) * W
    CG = C * G
    out_shape = [
        jax.ShapeDtypeStruct((CK, NBW), dt_),
        jax.ShapeDtypeStruct((CK, NBW), dt_),
        jax.ShapeDtypeStruct((CG, Fp), dt_),
    ]
    out_specs = [
        pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((CG, TF), lambda t, blk: (0, t)),
    ]
    if emit_charvel:
        out_shape.append(jax.ShapeDtypeStruct((1, Fp), dt_))
        out_specs.append(pl.BlockSpec((1, TF), lambda t, blk: (0, t)))

    wface = np.asarray(geom.tables["w_face"])
    outs = pl.pallas_call(
        _make_fused_kernel(system, TF, W, C, K, G, wface, emit_charvel),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(plan.ntileL,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # ksL
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t])),  # U lo
                pl.BlockSpec((CK, W), lambda t, blk: (0, blk[t] + 1)),
                pl.BlockSpec((CK, TF), lambda t, blk: (0, t)),     # UvR
                pl.BlockSpec((3 * G, TF), lambda t, blk: (0, t)),  # xi_l
                pl.BlockSpec((3 * G, TF), lambda t, blk: (0, t)),  # xi_r
                pl.BlockSpec((3, TF), lambda t, blk: (0, t)),      # fn
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # farea
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # bctype
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(plan.blkL, plan.ksL, _padU(U, NBW), _padU(U, NBW), UvRp,
      xil, xir, fn, fa, bt)

    lo, hi, wflout = outs[0], outs[1], outs[2]
    lo = jnp.where(plan.mloL > 0, lo, 0.0)
    hi = jnp.where(plan.mhiL > 0, hi, 0.0)
    accL = (lo + hi)[:, :plan.E]

    # right-side pass: permute the (C*G) weighted flux to er-sorted
    # order (cheap — XLA's gather triples above 16 rows) and contract
    # the basis + accumulate in one kernel
    wflR = wflout[:, :F][:, plan.permR]
    accR = basis_accum_pass(plan, wflR, C, K, G, interpret=interpret)
    acc = accL + accR
    if _debug_contrib:
        return acc, wflout[:, :F]
    if emit_charvel:
        return acc, outs[3][0, :F]
    return acc


def _padU(U, NBW):
    return jnp.pad(U, ((0, 0), (0, NBW - U.shape[1])))


def _make_nearfar_kernel(system, TF, W, C, K, G, wface, far,
                         sr_in=False, nb=2):
    """Shared near/far fused kernel.

    Both variants gather LEFT states in-window, run basis+BC+Riemann,
    and accumulate [left contributions; dt charvel row] at el.  The
    NEAR variant additionally gathers the RIGHT states in-window (er
    within the tile's nb-block output window by construction: nb=2
    classic, nb=4 under QUINOA_NEAR_NB=4 with two extra U blocks and
    two extra accumulation arrays) and accumulates the right
    contributions + dt row at er — no pre-gather, no permute, no
    second pass.  The FAR variant takes pre-gathered right states and
    emits [weighted flux; charvel] rows for the er-sorted R pass; with
    sr_in the right states arrive pre-evaluated at the face Gauss
    points (C*G rows from the er-sorted rstate pass) instead of as
    CK-row modal states."""
    from ..pde.dg import BC_INTERIOR

    def kernel(blk_ref, ks_ref, ker_ref, ulo_ref, uhi_ref, *rest):
        rest = list(rest)
        uex = []
        if far and sr_in:
            (uvr_ref, xil_ref, fn_ref, fa_ref, bt_ref,
             lo_ref, hi_ref, wfl_ref) = rest
            out_refs = [lo_ref, hi_ref]
        elif far:
            (uvr_ref, xil_ref, xir_ref, fn_ref, fa_ref, bt_ref,
             lo_ref, hi_ref, wfl_ref) = rest
            out_refs = [lo_ref, hi_ref]
        else:
            uex = rest[:nb - 2]
            (xil_ref, xir_ref, fn_ref, fa_ref, bt_ref,
             *out_refs) = rest[nb - 2:]
            lo_ref, hi_ref = out_refs[0], out_refs[1]
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            for oref in out_refs:
                oref[...] = jnp.zeros_like(oref)

        dt_ = ulo_ref.dtype
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)

        iota_a = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        hot_lo = jnp.where(locc == iota_a, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hot_hi = jnp.where(locc - W == iota_a, 1.0, 0.0).astype(dt_) \
            * validf[:, None]

        lane = _use_lane_gather()
        if lane:
            UvL = _lane_window_gather(
                [ulo_ref[...], uhi_ref[...]], loc, validf, TF, W, dt_)
        else:
            # gather-direction masks are built TRANSPOSED (Mosaic only
            # lowers the bf16-split matmul on [1],[0] contractions)
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
            loc_g = loc[None, :]
            hot_loT = jnp.where(iota_g == loc_g, 1.0, 0.0).astype(dt_) \
                * validf[None, :]
            hot_hiT = jnp.where(iota_g == loc_g - W, 1.0, 0.0) \
                .astype(dt_) * validf[None, :]
            UvL = (onehot_dot(ulo_ref[...], hot_loT)
                   + onehot_dot(uhi_ref[...], hot_hiT))
        UvL = UvL.reshape(C, K, TF)

        if far and not sr_in:
            UvR = uvr_ref[...].reshape(C, K, TF)
        elif not far:
            ker = ker_ref[0, :]
            locr = (ker - b * W)[:, None]
            validr = jnp.where(ker >= 0, 1.0, 0.0).astype(dt_)
            # per output-aligned block j in [0, nb): accumulation-
            # direction (TF, W) masks (the scatter side has no lane-
            # gather analog)
            hot_r = [
                jnp.where(locr - j * W == iota_a, 1.0, 0.0).astype(dt_)
                * validr[:, None]
                for j in range(nb)
            ]
            ublocks = [ulo_ref, uhi_ref] + uex
            if lane:
                UvR = _lane_window_gather(
                    [u[...] for u in ublocks], ker - b * W, validr,
                    TF, W, dt_)
            else:
                iota_g = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
                locr_g = ker[None, :] - b * W
                UvR = sum(
                    onehot_dot(
                        ublocks[j][...],
                        jnp.where(iota_g == locr_g - j * W, 1.0, 0.0)
                        .astype(dt_) * validr[None, :])
                    for j in range(nb)
                )
            UvR = UvR.reshape(C, K, TF)

        xi_l = xil_ref[...].reshape(3, G, TF)
        B_l = eval_basis_cm(K, xi_l)

        def row3(a, k):
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(a, k, k + 1, axis=0), (0,))

        def dof3(a, k):
            return jax.lax.slice_in_dim(a, k, k + 1, axis=1)

        sL = sum(row3(B_l, k)[None] * dof3(UvL, k) for k in range(K))
        if far and sr_in:
            # right states arrive pre-evaluated at the Gauss points
            # (er-sorted rstate pass + below-cliff permute)
            sR = uvr_ref[...].reshape(C, G, TF)
        else:
            xi_r = xir_ref[...].reshape(3, G, TF)
            B_r = eval_basis_cm(K, xi_r)
            sR = sum(row3(B_r, k)[None] * dof3(UvR, k)
                     for k in range(K))
        vf3 = validf[None, None, :] > 0
        sL = jnp.where(vf3, sL, 1.0)
        sR = jnp.where(vf3, sR, 1.0)

        fnf = fn_ref[...][:, None, :]
        bt = bt_ref[...]
        interior = (bt == BC_INTERIOR)[:, None, :]
        sR = jnp.where(interior, sR, system.bc_state(bt[:, None, :], sL,
                                                     fnf, None, 0.0))
        fl = system.riemann(fnf, sL, sR, None, 0.0)

        fa = jax.lax.squeeze(fa_ref[...], (0,)) * validf
        wt = jnp.stack([float(wface[g]) * fa for g in range(G)])
        wfl = fl * wt[None]

        # dt charvel row (DG.cpp:1361-1430): wt-weighted max wave speed
        vl = system.charvel(sL, fnf, None)
        vr = system.charvel(sR, fnf, None)
        mx = (wt * jnp.where(interior[0], jnp.maximum(vl, vr), vl)).sum(0)

        rowsL = [
            -(row3(B_l, k) * row3(wfl, c)).sum(0)
            for c in range(C) for k in range(K)
        ] + [mx]
        contribL = jnp.stack(rowsL)             # (CK+1, TF)
        lo_ref[...] += onehot_dot(contribL, hot_lo)
        hi_ref[...] += onehot_dot(contribL, hot_hi)

        if far:
            wfl_ref[...] = jnp.concatenate(
                [wfl.reshape(C * G, TF), mx[None]], axis=0)
        else:
            rowsR = [
                (row3(B_r, k) * row3(wfl, c)).sum(0)
                for c in range(C) for k in range(K)
            ] + [mx]
            contribR = jnp.stack(rowsR)
            # hot_r are already zero for boundary/pad faces (ker=-1)
            for j in range(nb):
                out_refs[j][...] += onehot_dot(contribR, hot_r[j])

    return kernel


def _make_far_rstate_kernel(TF, W, C, K, G):
    """Er-sorted far right-state pass: window-gather er modal states
    (er-sorted far faces target the blkRF windows, so er is in-window
    by construction) and evaluate the face-right Gauss-point states
    sR (C*G rows).  Replaces the far stream's CK-row right-state XLA
    gather — C*G=15 rows permute back below the 16-row gather cliff
    while C*K=20 rows sit above it (ROADMAP measured landmark)."""

    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, xir_ref, o_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        dt_ = ulo_ref.dtype
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        if _use_lane_gather():
            u = _lane_window_gather([ulo_ref[...], uhi_ref[...]],
                                    loc, validf, TF, W, dt_)
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
            locr = loc[None, :]
            hot_lo = jnp.where(iota == locr, 1.0, 0.0).astype(dt_) \
                * validf[None, :]
            hot_hi = jnp.where(iota == locr - W, 1.0, 0.0).astype(dt_) \
                * validf[None, :]
            u = (onehot_dot(ulo_ref[...], hot_lo)
                 + onehot_dot(uhi_ref[...], hot_hi))
        UvR = u.reshape(C, K, TF)
        xi_r = xir_ref[...].reshape(3, G, TF)
        B_r = eval_basis_cm(K, xi_r)

        def row3(a, k):
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(a, k, k + 1, axis=0), (0,))

        def dof3(a, k):
            return jax.lax.slice_in_dim(a, k, k + 1, axis=1)

        sR = sum(row3(B_r, k)[None] * dof3(UvR, k) for k in range(K))
        o_ref[...] = sR.reshape(C * G, TF)

    return kernel


def far_rstate_pass(fp, U, C, K, G, interpret=None, Upad=None):
    """U (C*K, E) -> (C*G, FpF) el-sorted-far-order right states at the
    face Gauss points, computed in the er-sorted windows.  Upad lets the
    caller share ONE padded copy of U across all window kernels (any
    width >= (nblkRF+2)*WRF works: BlockSpec indexing never reads past
    the last visited block)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    TF = fp.ksRF.shape[-1] // fp.ntileRF
    WRF = fp.WRF
    NBW = (fp.nblkRF + 2) * WRF
    if Upad is None or Upad.shape[1] < NBW or Upad.shape[1] % WRF:
        Upad = _padU(U, NBW)
    srER = pl.pallas_call(
        _make_far_rstate_kernel(TF, WRF, C, K, G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(fp.ntileRF,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((C * K, WRF), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((C * K, WRF),
                             lambda t, blk: (0, blk[t] + 1)),
                pl.BlockSpec((3 * G, TF), lambda t, blk: (0, t)),
            ],
            out_specs=pl.BlockSpec((C * G, TF), lambda t, blk: (0, t)),
        ),
        out_shape=jax.ShapeDtypeStruct((C * G, fp.ntileRF * TF),
                                       U.dtype),
        interpret=interpret,
    )(fp.blkRF, fp.ksRF, Upad, Upad, fp.xirRF)
    # permute er-sorted -> el-sorted far order (C*G rows: below cliff)
    return srER[:, :fp.Ff][:, fp.ipermRF]


def _make_far_raccum_kernel(TF, W, C, K, G):
    """Far R pass: contract [wfl; mx] rows against B_r(er-sorted xi_r)
    and window-accumulate (CK+1 rows incl. the dt charvel row)."""

    def kernel(blk_ref, ks_ref, xir_ref, w_ref, lo_ref, hi_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        dt_ = w_ref.dtype
        ks = ks_ref[0, :]
        loc = ks - b * W
        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)

        xi_r = xir_ref[...].reshape(3, G, TF)
        B_r = eval_basis_cm(K, xi_r)            # (K, G, TF)
        w = w_ref[...]                          # (CG+1, TF)

        def brow(k, g):
            s1 = jax.lax.slice_in_dim(B_r, k, k + 1, axis=0)
            s1 = jax.lax.slice_in_dim(s1, g, g + 1, axis=1)
            return jax.lax.squeeze(s1, (0, 1))

        def wrow(i):
            return jax.lax.squeeze(
                jax.lax.slice_in_dim(w, i, i + 1, axis=0), (0,))

        rows = [
            sum(brow(k, g) * wrow(c * G + g) for g in range(G))
            for c in range(C) for k in range(K)
        ]
        rows.append(wrow(C * G))                # dt charvel passthrough
        x = jnp.stack(rows)                     # (CK+1, TF)

        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)

    return kernel


def fused_face_pass_nearfar(system, geom, plan: AccumPlan, U,
                            interpret=None):
    """Near/far fused face pass: returns (acc (C*K, E), delt (E,)) —
    the accumulated surface integral AND the dt sweep's per-element
    summed charvel (DG.cpp dt's delt), both from the same kernels.

    Near faces (er in el's W-block, 67-84% on SFC meshes) never touch
    HBM for states or contributions beyond the window blocks; far faces
    pre-gather er states and run the 16-row er-sorted R pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fp = plan.fused
    C = system.ncomp
    K = geom.ndof
    G = np.asarray(geom.tables["w_face"]).shape[0]
    CK = C * K
    CK1 = CK + 1
    CG1 = C * G + 1
    TF, W = plan.TF, plan.W
    dt_ = U.dtype
    wface = np.asarray(geom.tables["w_face"])

    # near right-window block count (QUINOA_NEAR_NB at plan build)
    nbN = 2 + (0 if fp.near.mex is None else fp.near.mex.shape[-2])

    # ONE shared padded copy of U for every window kernel in this pass
    # (near, far, and the er-sorted rstate pass) — three separate _padU
    # calls cost three HBM copies of the (C*K, E) state per stage.  The
    # common width must be a multiple of every stream's window so the
    # BlockSpecs tile it exactly.
    _widths = [(fp.near.nblk + nbN) * fp.near.W,
               (fp.far.nblk + 2) * fp.far.W,
               (fp.nblkRF + 2) * fp.WRF]
    _ws = [fp.near.W, fp.far.W, fp.WRF]
    _lcm = int(np.lcm.reduce(np.asarray(_ws, dtype=np.int64)))
    NBWmax = -(-max(_widths) // _lcm) * _lcm
    Ushared = _padU(U, NBWmax)

    def stream_call(st, far, extra_in=(), sr_in=False):
        Ws = st.W
        nb = 2 if far else nbN
        NBW = (st.nblk + nb) * Ws

        def _ospec(j):
            return pl.BlockSpec((CK1, Ws), lambda t, blk: (0, blk[t] + j))

        def _uspec(j):
            return pl.BlockSpec((CK, Ws), lambda t, blk: (0, blk[t] + j))

        Upad = Ushared if NBWmax % Ws == 0 else _padU(U, NBW)
        out_shape = [jax.ShapeDtypeStruct((CK1, NBW), dt_)
                     for _ in range(nb)]
        out_specs = [_ospec(j) for j in range(nb)]
        in_specs = [
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # ks
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # ker
            _uspec(0),
            _uspec(1),
        ]
        args = [st.blk, st.ks, st.ker, Upad, Upad]
        if not far and nb > 2:
            # extra right-gather U blocks ride right after ulo/uhi
            in_specs += [_uspec(j) for j in range(2, nb)]
            args += [Upad] * (nb - 2)
        if far:
            rrows = C * G if sr_in else CK
            in_specs.append(
                pl.BlockSpec((rrows, TF), lambda t, blk: (0, t)))
            args.append(extra_in[0])
            out_shape.append(
                jax.ShapeDtypeStruct((CG1, st.ntile * TF), dt_))
            out_specs.append(pl.BlockSpec((CG1, TF),
                                          lambda t, blk: (0, t)))
        in_specs.append(pl.BlockSpec((3 * G, TF),
                                     lambda t, blk: (0, t)))   # xi_l
        args.append(st.xil)
        if not (far and sr_in):
            # sr_in kernels never evaluate B_r: don't DMA xi_r blocks
            in_specs.append(pl.BlockSpec((3 * G, TF),
                                         lambda t, blk: (0, t)))  # xi_r
            args.append(st.xir)
        in_specs += [
            pl.BlockSpec((3, TF), lambda t, blk: (0, t)),      # fn
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # fa
            pl.BlockSpec((1, TF), lambda t, blk: (0, t)),      # bt
        ]
        args += [st.fn, st.fa, st.bt]
        return pl.pallas_call(
            _make_nearfar_kernel(system, TF, Ws, C, K, G, wface, far,
                                 sr_in=sr_in, nb=nb),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(st.ntile,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(*args)

    import os as _os

    # QUINOA_ABLATE={near,far}: TIMING-ONLY debug switch that zeroes a
    # whole stream's contribution (physically wrong — used to measure
    # each pass group's in-step cost for the perf decomposition; the
    # bench gate treats it as a non-default flag)
    _abl = _os.environ.get("QUINOA_ABLATE", "")

    # near stream: both sides + dt rows, fully in-window (nbN output
    # arrays, one per block offset; masks pick each block's visited
    # phases and the sum reassembles the accumulation)
    if _abl == "near":
        accN = jnp.zeros((CK1, plan.E), dt_)
    else:
        outsN = stream_call(fp.near, far=False)
        masksN = [fp.near.mlo, fp.near.mhi] + [
            fp.near.mex[j:j + 1] for j in range(nbN - 2)
        ]
        accN = sum(jnp.where(m > 0, o, 0.0)
                   for m, o in zip(masksN, outsN))[:, :plan.E]

    # far stream: L side + wfl/mx emission
    FpF = fp.far.ntile * TF
    if _abl == "far":
        full = accN
        return full[:CK], full[CK]

    if _os.environ.get("QUINOA_FAR_SR", "1") == "1":
        # er-sorted in-window right-state pass: sR at the face Gauss
        # points (C*G rows) instead of the CK-row modal gather.
        # Default-on since the on-chip A/B (v5e, 48^3 Sedov dgp1):
        # far_sr 98.0 ms/step vs modal-gather 103.8 vs split 197.9;
        # QUINOA_FAR_SR=0 restores the gather variants below
        srF = far_rstate_pass(fp, U, C, K, G, interpret=interpret,
                              Upad=Ushared)
        loF, hiF, wflF = stream_call(fp.far, far=True, extra_in=(srF,),
                                     sr_in=True)
    else:
        if CK > 16 and _os.environ.get("QUINOA_SPLIT_FAR_GATHER") == "1":
            # XLA's TPU gather cost TRIPLES above 16 rows; split the
            # CK-row right-state gather into component groups of
            # <=16 rows each (2 halves for P1 compflow, 5 singles for
            # P2 compflow).  A/B experiment: flip the env var and
            # re-run bench.py
            Uv = U.reshape(C, K, -1)
            ngrp = -(-C // max(1, 16 // K))
            bounds = np.linspace(0, C, ngrp + 1).round().astype(int)
            UvRf = jnp.concatenate([
                Uv[a:b, :, fp.erF].reshape((b - a) * K, FpF)
                for a, b in zip(bounds[:-1], bounds[1:])
            ], axis=0)
        else:
            UvRf = U.reshape(C, K, -1)[:, :, fp.erF].reshape(CK, FpF)
        loF, hiF, wflF = stream_call(fp.far, far=True,
                                     extra_in=(UvRf,))
    accF = (jnp.where(fp.far.mlo > 0, loF, 0.0)
            + jnp.where(fp.far.mhi > 0, hiF, 0.0))[:, :plan.E]

    # far R pass: 16-row permute to er-sorted order, contract+accumulate
    wR = wflF[:, :fp.Ff][:, fp.permRF]
    FpRF = fp.ntileRF * TF
    if wR.shape[-1] < FpRF:
        wR = jnp.pad(wR, ((0, 0), (0, FpRF - wR.shape[-1])))
    WRF = fp.WRF
    loR, hiR = pl.pallas_call(
        _make_far_raccum_kernel(TF, WRF, C, K, G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(fp.ntileRF,),
            in_specs=[
                pl.BlockSpec((1, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((3 * G, TF), lambda t, blk: (0, t)),
                pl.BlockSpec((CG1, TF), lambda t, blk: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((CK1, WRF), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((CK1, WRF), lambda t, blk: (0, blk[t] + 1)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((CK1, (fp.nblkRF + 2) * WRF), dt_),
            jax.ShapeDtypeStruct((CK1, (fp.nblkRF + 2) * WRF), dt_),
        ],
        interpret=interpret,
    )(fp.blkRF, fp.ksRF, fp.xirRF, wR)
    accR = (jnp.where(fp.mloRF > 0, loR, 0.0)
            + jnp.where(fp.mhiRF > 0, hiR, 0.0))[:, :plan.E]

    full = accN + accF + accR
    return full[:CK], full[CK]
