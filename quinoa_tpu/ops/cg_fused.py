"""Fused DiagCG+FCT window kernels: gather + element math + assembly in
ONE Pallas pass per FCT stage.

Why: the XLA formulation of the DiagCG step is a ~6-deep chain of
DEPENDENT gather/assembly stages, each sitting on the TPU gather-latency
cliff (ROADMAP: 117 ms/step at 48^3 against a ~1 ms HBM roofline).  The
round-2/3 attempts that kernelized ONLY the gather or ONLY the assembly
lost end-to-end because every pallas_call boundary materializes the
(4, C, E) element slabs XLA otherwise fuses away.  These kernels remove
the boundary instead: each pass reads the nodal fields through the
in-VMEM one-hot window (ops/node_window.py plan), runs the ELEMENT MATH
inside the kernel (Taylor-Galerkin rhs, FCT mass diffusion, AEC, allowed
extrema, limit coefficients — FluxCorrector.cpp:30-470 semantics), and
accumulates straight back into the node windows — no element slab ever
touches HBM.

Three passes replace the whole step's gather chain:

  K1 (from u):        rhs + mass-diffusion + AEC's P sums  -> (4C, N)
  K2 (from u, ul):    allowed extrema Q = [qmax | -qmin]    -> (2C, N)
  K3 (from u, Rp/Rm): limited antidiffusive sums A          -> (C, N)

(The AEC needs only Un — FluxCorrector::aec's dUh term is zero for the
lumped-mass high-order scheme — so P assembles in K1 and K3 recomputes
the AEC from the same window rather than materializing it.)

Far slots (node outside the tile window, ~8% at W=1024 after first-touch
ordering) are emitted as a compact per-tile stream and folded in by the
existing target-sorted far pass.  Env-gated: QUINOA_CG_FUSED=1 (plus a
NodePlan on the geometry).

Coverage: BOTH DiagCG flavors — transport (static-velocity CGTransport,
`_build_transport_plan`) AND compflow (Euler flux + EoS + manufactured
source traced in-kernel on the corner-state blocks,
`_build_compflow_plan`) — and BOTH deployments: single-shard
(`build_cg_fused_plan`) and stacked-SPMD under shard_map
(`build_cg_fused_plan_stacked`, forced-uniform per-shard plans; the
fused SPMD path also cuts one halo exchange by carrying [rhs|dif|P+|P-]
in a single combine).  ALECG gets the same treatment in
ops/alecg_fused.py behind the same env flag.

STATUS: default-OFF after losing the round-3 silicon A/B — 210 ms/step
vs the XLA path's 109 at 48^3 (ALECG 274 vs 217).  The O(S*W) one-hot
window build at CG's W=1024 node windows exceeds the entire gather
chain it replaces; see PERFORMANCE.md "DiagCG + FCT" for the floor
analysis.  Parity-tested (tests/test_cg_fused.py) so the variant stays
green, but do NOT grow this surface — the open structural exit is
eliminating the gathers (edge-based assembly), not repackaging them.
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

from .face_accum import _one_pass
from .node_window import NodePlan, build_node_plan, _one_pass_max


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["plan", "stat"],
    meta_fields=["C", "ctau", "Rs", "TE", "kind"],
)
@dataclasses.dataclass(frozen=True)
class CGFusedPlan:
    """NodePlan + per-element static rows for the fused kernels.

    stat row layout (Rs, ntile*TE), zero-padded elements carry
    vol_n = 1 and bc_n = 1 so their AEC is exactly zero (never NaN):

      [0:12)          grad[3a+j]
      12              J*emask/6
      13              J*emask/120
      [14:18)         vol_n[a]
      [18:18+4C)      bc_n[a*C+c]
      [B0:B0+12C)     vel_n[(a*C+c)*3+j]   (B0 = 18+4C)
      [B1:B1+3C)      vel_c[c*3+j]         (B1 = B0+12C)
    """

    plan: NodePlan
    stat: jnp.ndarray
    C: int
    ctau: float
    Rs: int
    TE: int
    kind: str = "transport"


def _qualifies(system, coords_probe):
    """The kernels bake the velocity into static rows: require a
    velocity-carrying system without diffusion whose velocity ignores
    t (probed empirically)."""
    prob = getattr(system, "problem", None)
    if prob is None or getattr(system, "diffusivity", None) is not None:
        return None
    xs = np.asarray(coords_probe)[:, :64]
    try:
        v0 = np.asarray(prob.velocity(jnp.asarray(xs), 0.0))
        v1 = np.asarray(prob.velocity(jnp.asarray(xs), 0.7391))
    except Exception:
        return None
    if not np.array_equal(v0, v1):
        return None
    return prob


def _env_dims(TF, W):
    import os

    TF = int(os.environ.get("QUINOA_CGF_TF", TF))
    W = int(os.environ.get("QUINOA_CGF_W", W))
    # Mosaic needs the stat block's trailing dim (TE = TF/4) to be a
    # multiple of 128, and the lo/hi window blocks need W % 128 == 0.
    TF = max(512, -(-TF // 512) * 512)
    W = max(128, -(-W // 128) * 128)
    return TF, W


def build_cg_fused_plan(system, geom, bcmask, ctau: float,
                        TF: int = 512, W: int = 1024, force=None):
    """Host-side fused plan, or None when the configuration doesn't
    qualify.  Two K1 flavors: static-velocity transport (velocity rows
    baked into stat) and compflow Euler (EoS + flux traced in-kernel
    from the corner states; element-node coordinates baked in for the
    manufactured source)."""
    if (getattr(system, "ncomp", 0) == 5 and hasattr(system, "eos")
            and geom.coords_n is not None):
        return _build_compflow_plan(system, geom, bcmask, ctau, TF, W,
                                    force)
    prob = _qualifies(system, geom.coords)
    if prob is None:
        return None

    TF, W = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    inpoelT = np.asarray(geom.inpoelT)
    plan = build_node_plan(inpoelT.T, geom.nnode, TF=TF, W=W,
                           dtype=dtype, force=force)

    C = system.ncomp
    E = inpoelT.shape[1]
    TE = TF // 4
    Ep = plan.ntile * TE
    B0 = 18 + 4 * C
    B1 = B0 + 12 * C
    Rs = B1 + 3 * C
    stat = np.zeros((Rs, Ep), dtype)
    _fill_base_rows(stat, geom, bcmask, C, E, inpoelT)
    cn = np.asarray(geom.coords_n, np.float64)        # (4, 3, E)
    ctr = np.asarray(geom.ctr, np.float64)            # (3, E)
    for a in range(4):
        vn = np.asarray(prob.velocity(jnp.asarray(cn[a]), 0.0),
                        np.float64)                   # (C, 3, E)
        for c in range(C):
            for j in range(3):
                stat[B0 + (a * C + c) * 3 + j, :E] = vn[c, j]
    vc = np.asarray(prob.velocity(jnp.asarray(ctr), 0.0), np.float64)
    for c in range(C):
        for j in range(3):
            stat[B1 + c * 3 + j, :E] = vc[c, j]

    return CGFusedPlan(plan=plan, stat=jnp.asarray(stat), C=C,
                       ctau=float(ctau), Rs=Rs, TE=TE)


def build_cg_fused_plan_stacked(system, sharded, ctau: float,
                                TF: int = 512, W: int = 1024):
    """Per-shard fused plans with FORCED-uniform static dims, stacked on
    a leading shard axis so one shard_map program serves every device
    (the build_accum_plan_stacked pattern).  Returns None when the
    configuration doesn't qualify."""
    geom = sharded.geom
    is_compflow = (getattr(system, "ncomp", 0) == 5
                   and hasattr(system, "eos"))
    if not is_compflow and \
            _qualifies(system, np.asarray(geom.coords)[0]) is None:
        return None
    S = sharded.nshard

    def shard_geom(s):
        from ..pde.cg import CGGeom

        g = geom
        return CGGeom(
            coords=g.coords[s], inpoelT=g.inpoelT[s], J=g.J[s],
            grad=g.grad[s], vol=g.vol[s], emask=g.emask[s],
            nsup=g.nsup[s], nnode=int(g.coords.shape[-1]),
            plan=None, coords_n=g.coords_n[s], ctr=g.ctr[s],
        )

    # pass 1: natural dims per shard (plan only; the stat table is
    # not needed to read six dimension scalars)
    TFd, Wd = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    nats = [build_node_plan(np.asarray(geom.inpoelT[s]).T,
                            int(geom.coords.shape[-1]), TF=TFd, W=Wd,
                            dtype=dtype) for s in range(S)]
    force = dict(
        ntile=max(q.ntile for q in nats),
        nblk=max(q.nblk for q in nats),
        FTS=max(q.FTS for q in nats),
        ntileF=max(q.ntileF for q in nats),
        nblkF=max(q.nblkF for q in nats),
        WF=max(q.WF for q in nats),
    )
    # pass 2: rebuild forced, then stack; nfar legitimately differs
    # per shard -- normalize the meta to -1 ('varies') so the pytree
    # aux data matches across shards (it is informational only)
    fps = []
    for s in range(S):
        fp = build_cg_fused_plan(system, shard_geom(s),
                                 sharded.bcmask[s], ctau, TF=TF, W=W,
                                 force=force)
        if fp is None:
            return None
        fps.append(dataclasses.replace(
            fp, plan=dataclasses.replace(fp.plan, nfar=-1)))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fps)


def _build_compflow_plan(system, geom, bcmask, ctau, TF, W, force):
    TF, W = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    inpoelT = np.asarray(geom.inpoelT)
    plan = build_node_plan(inpoelT.T, geom.nnode, TF=TF, W=W,
                           dtype=dtype, force=force)
    C = 5
    E = inpoelT.shape[1]
    TE = TF // 4
    Ep = plan.ntile * TE
    # rows: grad 12 | j6 | j120 | vol_n 4 | bc_n 4C | cn 12 | ctr 3
    # | emask 1 (pads blend to a safe rho=1 state: the EoS divides by
    # rho, and a 0/0 NaN poisons even zero-weighted matmul columns)
    B0 = 18 + 4 * C
    Rs = B0 + 16
    stat = np.zeros((Rs, Ep), dtype)
    _fill_base_rows(stat, geom, bcmask, C, E, inpoelT)
    cn = np.asarray(geom.coords_n, np.float64)        # (4, 3, E)
    ctr = np.asarray(geom.ctr, np.float64)            # (3, E)
    for a in range(4):
        for j in range(3):
            stat[B0 + a * 3 + j, :E] = cn[a, j]
    for j in range(3):
        stat[B0 + 12 + j, :E] = ctr[j]
    stat[B0 + 15, :E] = np.asarray(geom.emask, np.float64)
    return CGFusedPlan(plan=plan, stat=jnp.asarray(stat), C=C,
                       ctau=float(ctau), Rs=Rs, TE=TE, kind="compflow")


def _make_k1_compflow(TF, TE, W, FTS, C, Rs, ctau, system):
    from ..pde.problems.compflow import euler_flux_dir

    eos = system.eos
    prob = system.problem
    manufactured = bool(getattr(prob, "manufactured", False))

    def kernel(blk_ref, dt_ref, t_ref, ks_ref, ulo_ref, uhi_ref,
               fv_ref, fpos_ref, stat_ref, lo_ref, hi_ref, far_ref):
        t_ = pl.program_id(0)
        b = blk_ref[t_]
        fresh = (t_ == 0) | (b != blk_ref[jnp.maximum(t_ - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        dtv = dt_ref[0, 0]
        tv = t_ref[0, 0]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos_ref[0, :], FTS)
        hots = _corner_hots(TF, TE, un.dtype)
        una = _corners(un, hots)
        stat = stat_ref[...]
        B0 = 18 + 4 * C
        m = stat[B0 + 15:B0 + 16, :]
        una = _safe_state(una, m, C, TE, un.dtype)

        # stage 1: divergence of the Euler flux at the corner states
        divF = jnp.zeros((C, TE), un.dtype)
        for a in range(4):
            p_a = eos.pressure_cons_cm(una[a])
            for j in range(3):
                g = stat[3 * a + j:3 * a + j + 1, :]
                divF = divF + g * euler_flux_dir(una[a], p_a, j)
        ue = 0.25 * (una[0] + una[1] + una[2] + una[3]) \
            - 0.5 * dtv * divF
        if manufactured:
            s = jnp.zeros((C, TE), un.dtype)
            for a in range(4):
                cn_a = stat[B0 + a * 3:B0 + (a + 1) * 3, :]
                s = s + prob.src(cn_a, tv)
            ue = ue + 0.5 * dtv * s / 4.0

        # stage 2: fluxes on the intermediate state, to nodes
        p_e = eos.pressure_cons_cm(ue)
        F = [euler_flux_dir(ue, p_e, j) for j in range(3)]
        d = dtv * stat[12:13, :]
        j120 = stat[13:14, :]
        s_un = una[0] + una[1] + una[2] + una[3]
        sc = None
        if manufactured:
            ctr_r = stat[B0 + 12:B0 + 15, :]
            sc = prob.src(ctr_r, tv + 0.5 * dtv)
        ra, difa = [], []
        for a in range(4):
            vflux = jnp.zeros((C, TE), un.dtype)
            for j in range(3):
                g = stat[3 * a + j:3 * a + j + 1, :]
                vflux = vflux + g * F[j]
            r_a = d * vflux
            if sc is not None:
                r_a = r_a + (d / 4.0) * sc
            ra.append(r_a)
            difa.append(-ctau * j120 * (4.0 * una[a] - s_un))
        aeca = _aec_math(una, stat, C, TE, ctau)

        xa = [jnp.concatenate(
            [ra[a], difa[a], jnp.maximum(aeca[a], 0.0),
             jnp.minimum(aeca[a], 0.0)], axis=0) for a in range(4)]
        x = _to_slots(xa, hots)

        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(x.dtype)
        loc = ks - b * W
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)
        far_ref[...] = _far_emit(x, fpos_ref[0, :], FTS, TF)

    return kernel


# -- kernel building blocks ---------------------------------------------------


def _window_gather(ks, b, TF, W, ulo, uhi, fv, fpos, FTS):
    """In-kernel nodal gather: window one-hots + far placement.
    ulo/uhi (R, W), fv (R, FTS) -> (R, TF) slot values."""
    dt_ = ulo.dtype
    loc = ks - b * W
    validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, TF), 0)
    locr = loc[None, :]
    hot_lo = jnp.where(iota == locr, 1.0, 0.0).astype(dt_) \
        * validf[None, :]
    hot_hi = jnp.where(iota == locr - W, 1.0, 0.0).astype(dt_) \
        * validf[None, :]
    u = (onehot_dot(ulo, hot_lo)
         + onehot_dot(uhi, hot_hi))
    pv = jnp.where(fpos >= 0, 1.0, 0.0).astype(dt_)
    iotf = jax.lax.broadcasted_iota(jnp.int32, (FTS, TF), 1)
    hotf = jnp.where(fpos[:, None] == iotf, 1.0, 0.0).astype(dt_) \
        * pv[:, None]
    return u + onehot_dot(fv, hotf)


def _corner_hots(TF, TE, dtype, k: int = 4):
    """hot[a] (TF, TE): slot s belongs to entity s//k, corner s%k
    (k = 4 for tet elements, 2 for edges)."""
    ia = jax.lax.broadcasted_iota(jnp.int32, (TF, TE), 0)
    ie = jax.lax.broadcasted_iota(jnp.int32, (TF, TE), 1)
    return [jnp.where(ia == k * ie + a, 1.0, 0.0).astype(dtype)
            for a in range(k)]


def _corners(u, hots):
    """(R, TF) slot values -> list of 4 (R, TE) per-corner blocks."""
    return [onehot_dot(u, h) for h in hots]


def _to_slots(xa, hots):
    """4 x (R, TE) per-corner blocks -> (R, TF) slot values."""
    out = None
    for x, h in zip(xa, hots):
        v = onehot_dotT(x, h)
        out = v if out is None else out + v
    return out


def _far_emit(x, fpos, FTS, TF, fill=0.0):
    """(R, TF) slot values -> (R, FTS) compact far stream (fill at
    pad columns)."""
    dt_ = x.dtype
    pv = jnp.where(fpos >= 0, 1.0, 0.0).astype(dt_)
    iotf = jax.lax.broadcasted_iota(jnp.int32, (FTS, TF), 1)
    hotf = jnp.where(fpos[:, None] == iotf, 1.0, 0.0).astype(dt_) \
        * pv[:, None]
    out = onehot_dotT(x, hotf)
    if fill != 0.0:
        out = jnp.where((pv > 0)[None, :], out, jnp.asarray(fill, dt_))
    return out


def _safe_state(blocks, m, C, TE, dtype):
    """Blend invalid (pad) entities to rho=1, zero momenta/energy: the
    compflow EoS divides by rho and a 0/0 NaN poisons even
    zero-weighted matmul columns."""
    # row-0 one-hot via iota: .at[].set lowers to lax.scatter, which
    # has no Pallas TPU lowering (this traces in-kernel)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, TE), 0)
    e0 = jnp.where(row == 0, 1.0, 0.0).astype(dtype)
    return [u * m + (1.0 - m) * e0 for u in blocks]


def _fill_base_rows(stat, geom, bcmask, C, E, inpoelT):
    """Populate the layout-bearing base rows shared by every CG K1/K3
    flavor: [0:12) grad | 12 J*emask/6 | 13 J*emask/120 | [14:18) vol_n
    | [18:18+4C) bc_n.  _aec_math and _make_k3 read these offsets (pad
    elements carry vol_n = bc_n = 1 so their AEC is exactly zero)."""
    grad = np.asarray(geom.grad, np.float64)
    Jm = np.asarray(geom.J, np.float64) * np.asarray(geom.emask,
                                                     np.float64)
    vol = np.asarray(geom.vol, np.float64)
    bc = np.asarray(bcmask, np.float64)
    B0 = 18 + 4 * C
    for a in range(4):
        for j in range(3):
            stat[3 * a + j, :E] = grad[a, j]
    stat[12, :E] = Jm / 6.0
    stat[13, :E] = Jm / 120.0
    stat[14:18, :] = 1.0
    for a in range(4):
        stat[14 + a, :E] = vol[inpoelT[a]]
    stat[18:B0, :] = 1.0
    for a in range(4):
        for c in range(C):
            stat[18 + a * C + c, :E] = bc[c][inpoelT[a]]


def _aec_math(una, stat, C, TE, ctau):
    """AEC per corner from un corners: (FluxCorrector::aec, dUh = 0).
    Returns list of 4 (C, TE)."""
    j120 = stat[13:14, :]                             # (1, TE)
    s = una[0] + una[1] + una[2] + una[3]             # (C, TE)
    out = []
    for a in range(4):
        me = ctau * j120 * (4.0 * una[a] - s)
        vol_a = stat[14 + a:15 + a, :]
        bc_a = stat[18 + a * C:18 + (a + 1) * C, :]   # (C, TE)
        aec = me / vol_a
        out.append(jnp.where(bc_a > 0, 0.0, aec))
    return out


# -- K1: rhs + dif + P --------------------------------------------------------


def _make_k1(TF, TE, W, FTS, C, Rs, ctau):
    def kernel(blk_ref, dt_ref, ks_ref, ulo_ref, uhi_ref, fv_ref,
               fpos_ref, stat_ref, lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        dtv = dt_ref[0, 0]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos_ref[0, :], FTS)
        hots = _corner_hots(TF, TE, un.dtype)
        una = _corners(un, hots)                      # 4 x (C, TE)
        stat = stat_ref[...]
        B0 = 18 + 4 * C
        B1 = B0 + 12 * C

        # stage 1: advective term + element intermediate at t + dt/2
        adv = jnp.zeros((C, TE), un.dtype)
        for a in range(4):
            for j in range(3):
                g = stat[3 * a + j:3 * a + j + 1, :]
                vr = jnp.stack([stat[B0 + (a * C + c) * 3 + j, :]
                                for c in range(C)])
                adv = adv + g * vr * una[a]
        ue = 0.25 * (una[0] + una[1] + una[2] + una[3]) - 0.5 * dtv * adv

        # stage 2: rhs contributions with center velocity
        d = dtv * stat[12:13, :]
        ra, difa = [], []
        s_un = una[0] + una[1] + una[2] + una[3]
        j120 = stat[13:14, :]
        for a in range(4):
            vdotg = jnp.zeros((C, TE), un.dtype)
            for j in range(3):
                g = stat[3 * a + j:3 * a + j + 1, :]
                vc = jnp.stack([stat[B1 + c * 3 + j, :]
                                for c in range(C)])
                vdotg = vdotg + g * vc
            ra.append(d * vdotg * ue)
            difa.append(-ctau * j120 * (4.0 * una[a] - s_un))
        aeca = _aec_math(una, stat, C, TE, ctau)

        xa = [jnp.concatenate(
            [ra[a], difa[a], jnp.maximum(aeca[a], 0.0),
             jnp.minimum(aeca[a], 0.0)], axis=0) for a in range(4)]
        x = _to_slots(xa, hots)                       # (4C, TF)

        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(x.dtype)
        loc = ks - b * W
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(x.dtype) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)
        far_ref[...] = _far_emit(x, fpos_ref[0, :], FTS, TF)

    return kernel


def _vmem_limit_bytes():
    """Scoped-vmem ceiling for the fused CG kernels.  The element math
    traced in-kernel (Taylor-Galerkin + FCT chain) needs more kernel
    stack than Mosaic's 16 MiB default (measured 21.8 MiB at the
    TF=512/W=1024 defaults on v5e); raise it, env-overridable."""
    import os

    return int(os.environ.get("QUINOA_CGF_VMEM", 64 * 2**20))


def _call_windowed(kernel, p: NodePlan, R, inputs, in_specs,
                   interpret, dtype):
    """Shared pallas_call scaffolding: blk prefetch, (R, W) lo/hi
    accumulators + (R, ntile*FTS) far stream."""
    NBW = (p.nblk + 2) * p.W
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p.ntile,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((R, p.W), lambda t, blk: (0, blk[t])),
                pl.BlockSpec((R, p.W), lambda t, blk: (0, blk[t] + 1)),
                pl.BlockSpec((R, p.FTS), lambda t, blk: (0, t)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, NBW), dtype),
            jax.ShapeDtypeStruct((R, NBW), dtype),
            jax.ShapeDtypeStruct((R, p.ntile * p.FTS), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(p.blk, *inputs)
    return outs


def _far_fold_add(p: NodePlan, far_out, interpret):
    """Compact far stream (R, ntile*FTS) -> (R, N) sum contributions via
    the target-sorted far pass."""
    R = far_out.shape[0]
    xf = jnp.concatenate(
        [far_out, jnp.zeros((R, 1), far_out.dtype)], axis=1
    )[:, p.afcol]
    return _one_pass(xf, p.ksF, p.blkF, p.mloF, p.mhiF, p.ntileF,
                     p.nblkF, p.TF, p.WF, p.N, interpret=interpret)


def _pad_u(p: NodePlan, U):
    NBW = (p.nblk + 2) * p.W
    return jnp.pad(U, ((0, 0), (0, NBW - p.N)))


def fused_rhs_dif_p(fp: CGFusedPlan, U, dt, interpret=None,
                    system=None, t=None):
    """K1: (C, N) nodal field -> (4C, N) assembled [rhs | dif | P+ | P-].
    kind == "compflow" traces the Euler flux/EoS (and the manufactured
    source at the baked-in element coordinates) inside the kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = fp.plan
    C = fp.C
    Up = _pad_u(p, U)
    fv = U[:, p.gfidx]
    dtm = jnp.asarray(dt, U.dtype).reshape(1, 1)
    R = 4 * C
    base_specs = [
        pl.BlockSpec((1, p.TF), lambda t_, blk: (0, t_)),
        pl.BlockSpec((C, p.W), lambda t_, blk: (0, blk[t_])),
        pl.BlockSpec((C, p.W), lambda t_, blk: (0, blk[t_] + 1)),
        pl.BlockSpec((C, p.FTS), lambda t_, blk: (0, t_)),
        pl.BlockSpec((1, p.FTS), lambda t_, blk: (0, t_)),
        pl.BlockSpec((fp.Rs, fp.TE), lambda t_, blk: (0, t_)),
    ]
    scalar_spec = pl.BlockSpec((1, 1), lambda t_, blk: (0, 0))
    if fp.kind == "compflow":
        if t is None:
            raise ValueError(
                "compflow fused K1 needs the current time t (the "
                "manufactured source is evaluated in-kernel)")
        tm = jnp.asarray(t, U.dtype).reshape(1, 1)
        lo, hi, far = _call_windowed(
            _make_k1_compflow(p.TF, fp.TE, p.W, p.FTS, C, fp.Rs,
                              fp.ctau, system),
            p, R, (dtm, tm, p.ks, Up, Up, fv, p.gfpos, fp.stat),
            [scalar_spec, scalar_spec] + base_specs, interpret, U.dtype)
    else:
        lo, hi, far = _call_windowed(
            _make_k1(p.TF, fp.TE, p.W, p.FTS, C, fp.Rs, fp.ctau),
            p, R, (dtm, p.ks, Up, Up, fv, p.gfpos, fp.stat),
            [scalar_spec] + base_specs, interpret, U.dtype)
    lo = jnp.where(p.mlo > 0, lo, 0.0)
    hi = jnp.where(p.mhi > 0, hi, 0.0)
    near = (lo + hi)[:, :p.N]
    return near + _far_fold_add(p, far, interpret)


# -- K2: allowed extrema Q ----------------------------------------------------


def _make_k2(TF, TE, W, FTS, C):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fvu_ref,
               llo_ref, lhi_ref, fvl_ref, fpos_ref,
               lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])
        dt_ = ulo_ref.dtype
        BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.full_like(lo_ref, -BIG)
            hi_ref[...] = jnp.full_like(hi_ref, -BIG)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fvu_ref[...], fpos, FTS)
        ul = _window_gather(ks, b, TF, W, llo_ref[...], lhi_ref[...],
                            fvl_ref[...], fpos, FTS)
        hots = _corner_hots(TF, TE, dt_)
        una = _corners(un, hots)
        ula = _corners(ul, hots)
        smax = None
        smin = None
        for a in range(4):
            mx = jnp.maximum(ula[a], una[a])
            mn = jnp.minimum(ula[a], una[a])
            smax = mx if smax is None else jnp.maximum(smax, mx)
            smin = mn if smin is None else jnp.minimum(smin, mn)
        s2 = jnp.concatenate([smax, -smin], axis=0)   # (2C, TE)
        # same per-element value at each of the 4 slots (each slot's
        # one-hot hits exactly one corner term)
        x = _to_slots([s2, s2, s2, s2], hots)

        loc = ks - b * W
        vf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        m_lo = (locc == iota) & (vf[:, None] > 0)
        m_hi = ((locc - W) == iota) & (vf[:, None] > 0)
        cand_lo = jnp.where(m_lo[None], x[:, :, None], -BIG).max(axis=1)
        cand_hi = jnp.where(m_hi[None], x[:, :, None], -BIG).max(axis=1)
        lo_ref[...] = jnp.maximum(lo_ref[...], cand_lo)
        hi_ref[...] = jnp.maximum(hi_ref[...], cand_hi)
        farv = _far_emit(x, fpos, FTS, TF)
        pvf = jnp.where(fpos >= 0, 1.0, 0.0).astype(dt_)
        far_ref[...] = jnp.where((pvf > 0)[None, :], farv, -BIG)

    return kernel


def fused_alw_q(fp: CGFusedPlan, U, Ul, interpret=None):
    """K2: -> (2C, N) = [qmax | -qmin] (the caller negates the min)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = fp.plan
    C = fp.C
    dt_ = U.dtype
    BIG = jnp.asarray(jnp.finfo(dt_).max, dt_) / 2
    Up = _pad_u(p, U)
    Ulp = _pad_u(p, Ul)
    fvu = U[:, p.gfidx]
    fvl = Ul[:, p.gfidx]
    R = 2 * C
    in_specs = [
        pl.BlockSpec((1, p.TF), lambda t, blk: (0, t)),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((C, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((C, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((1, p.FTS), lambda t, blk: (0, t)),
    ]
    lo, hi, far = _call_windowed(
        _make_k2(p.TF, fp.TE, p.W, p.FTS, C),
        p, R, (p.ks, Up, Up, fvu, Ulp, Ulp, fvl, p.gfpos), in_specs,
        interpret, U.dtype)
    lo = jnp.where(p.mlo > 0, lo, -BIG)
    hi = jnp.where(p.mhi > 0, hi, -BIG)
    near = jnp.maximum(lo, hi)[:, :p.N]
    xf = jnp.concatenate(
        [far, jnp.full((R, 1), -BIG, far.dtype)], axis=1
    )[:, p.afcol]
    farp = _one_pass_max(xf, p.ksF, p.blkF, p.mloF, p.mhiF, p.ntileF,
                         p.nblkF, p.TF, p.WF, p.N, interpret)
    out = jnp.maximum(near, farp)
    fill = jnp.asarray(jnp.finfo(dt_).min, dt_)
    return jnp.where(out <= -BIG / 2, fill, out)


# -- K3: limit + apply sums ---------------------------------------------------


def _make_k3(TF, TE, W, FTS, C, Rs, ctau):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fvu_ref,
               rlo_ref, rhi_ref, fvr_ref, fpos_ref, stat_ref,
               lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        dt_ = ulo_ref.dtype
        eps = jnp.asarray(jnp.finfo(dt_).eps, dt_)
        big = jnp.asarray(jnp.finfo(dt_).max, dt_)
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fvu_ref[...], fpos, FTS)
        rpm = _window_gather(ks, b, TF, W, rlo_ref[...], rhi_ref[...],
                             fvr_ref[...], fpos, FTS)     # (2C, TF)
        hots = _corner_hots(TF, TE, dt_)
        una = _corners(un, hots)
        rpma = _corners(rpm, hots)                        # 4 x (2C, TE)
        stat = stat_ref[...]
        aeca = _aec_math(una, stat, C, TE, ctau)

        cel = None
        for a in range(4):
            rp = rpma[a][:C]
            rm = rpma[a][C:]
            r = jnp.where(jnp.abs(aeca[a]) < eps, big,
                          jnp.where(aeca[a] > 0.0, rp, rm))
            cel = r if cel is None else jnp.minimum(cel, r)
        cel = jnp.minimum(cel, 1.0)                       # (C, TE)

        xa = [cel * aeca[a] for a in range(4)]
        x = _to_slots(xa, hots)                           # (C, TF)

        validf = jnp.where(ks >= 0, 1.0, 0.0).astype(dt_)
        loc = ks - b * W
        iota = jax.lax.broadcasted_iota(jnp.int32, (TF, W), 1)
        locc = loc[:, None]
        lo_hot = jnp.where(locc == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        hi_hot = jnp.where(locc - W == iota, 1.0, 0.0).astype(dt_) \
            * validf[:, None]
        lo_ref[...] += onehot_dot(x, lo_hot)
        hi_ref[...] += onehot_dot(x, hi_hot)
        far_ref[...] = _far_emit(x, fpos, FTS, TF)

    return kernel


def fused_lim_a(fp: CGFusedPlan, U, Rp, Rm, interpret=None):
    """K3: -> (C, N) assembled limited antidiffusive sums A."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = fp.plan
    C = fp.C
    Up = _pad_u(p, U)
    rpm = jnp.concatenate([Rp, Rm], axis=0)
    rpmp = _pad_u(p, rpm)
    fvu = U[:, p.gfidx]
    fvr = rpm[:, p.gfidx]
    in_specs = [
        pl.BlockSpec((1, p.TF), lambda t, blk: (0, t)),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((C, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((2 * C, p.W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((2 * C, p.W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((2 * C, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((1, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((fp.Rs, fp.TE), lambda t, blk: (0, t)),
    ]
    lo, hi, far = _call_windowed(
        _make_k3(p.TF, fp.TE, p.W, p.FTS, C, fp.Rs, fp.ctau),
        p, C, (p.ks, Up, Up, fvu, rpmp, rpmp, fvr, p.gfpos, fp.stat),
        in_specs, interpret, U.dtype)
    lo = jnp.where(p.mlo > 0, lo, 0.0)
    hi = jnp.where(p.mhi > 0, hi, 0.0)
    near = (lo + hi)[:, :p.N]
    return near + _far_fold_add(p, far, interpret)


# -- fused step ---------------------------------------------------------------


def _identity(x):
    return x


def diagcg_advance_fused(system, fp: CGFusedPlan, lhs, bcmask, u, t, dt,
                         geom, combine_sum=_identity,
                         combine_max=_identity):
    """One DiagCG+FCT update through the three fused passes; matches
    quinoa_tpu.inciter.diagcg.diagcg_advance semantics.  The combine
    hooks act on assembled node buffers at exactly the three points the
    sharded driver exchanges: [rhs|dif|P+|P-] (ONE sum exchange covers
    what the XLA path does in two), Q, and A."""
    C = u.shape[0]
    rdpq = combine_sum(fused_rhs_dif_p(fp, u, dt, system=system, t=t))
    r, dif = rdpq[:C], rdpq[C:2 * C]
    P = jnp.stack([rdpq[2 * C:3 * C], rdpq[3 * C:]])

    binc = system.solinc(geom.coords, t, dt).astype(u.dtype)
    lhs_eff = jnp.where(bcmask > 0, 1.0, lhs[None, :])
    r = jnp.where(bcmask > 0, binc, r)
    dif = jnp.where(bcmask > 0, 0.0, dif)
    ul = u + (r + dif) / lhs_eff

    q2 = combine_max(fused_alw_q(fp, u, ul))
    Q = jnp.stack([q2[:C], -q2[C:]])

    eps = jnp.asarray(jnp.finfo(u.dtype).eps, u.dtype)
    Qp = Q[0] - ul
    Qm = Q[1] - ul
    Rp = jnp.where(P[0] > 0.0,
                   jnp.minimum(1.0, Qp / jnp.where(P[0] > 0.0, P[0], 1.0)),
                   0.0)
    Rm = jnp.where(P[1] < 0.0,
                   jnp.minimum(1.0, Qm / jnp.where(P[1] < 0.0, P[1], 1.0)),
                   0.0)

    A = combine_sum(fused_lim_a(fp, u, Rp, Rm))
    return ul + A
