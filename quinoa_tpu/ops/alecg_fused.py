"""Fused ALECG window kernels: the RK-stage rhs as two Pallas passes.

The ALECG stage rhs is a Galerkin volume term (element-based, 4 slots
per element) plus an edge-Rusanov dissipation (edge-based, 2 slots per
edge); the XLA formulation is ~4 dependent gather/assembly launches per
RK stage x 3 stages.  For transport with a time-independent velocity
the per-entity coefficients are STATIC — the nodal flux velocities and
the edge dissipation weight A_ab * lambda_ab (charspeed ignores u) bake
into per-entity rows — so each pass is one window kernel:

  volume pass : x_a = -(V/4) sum_b grad_b . v_b u_b  (same value at
                all four slots of the element)
  edge pass   : x = [w (u_b - u_a), -w (u_b - u_a)]  (antisymmetric)

both accumulating straight into the node windows (ops/window_kernels.py
building blocks; far slots via the compact emit + target-sorted fold).
Env-gated with the same QUINOA_CG_FUSED=1 switch.
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
from .node_window import NodePlan, build_node_plan
from .window_kernels import (_qualifies, _env_dims, _window_gather,
                             _corner_hots, _corners, _to_slots,
                             _far_emit, _far_fold_add, _pad_u,
                             _call_windowed, _safe_state)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["eplan", "dplan", "estat", "dstat"],
    meta_fields=["C", "Rse", "TE", "TEd", "kind"],
)
@dataclasses.dataclass(frozen=True)
class ALECGFusedPlan:
    """Element + edge window plans and their static rows.

    estat rows (Rse, ntile_e*TE): [0:12) grad[3b+j]; 12 w=J*emask/24;
    [13:13+12C) v_n[(b*C+c)*3+j] (flux velocity at corner b).
    dstat rows (1, ntile_d*TEd): A_ab * lambda_ab.
    """

    eplan: NodePlan
    dplan: NodePlan
    estat: jnp.ndarray
    dstat: jnp.ndarray
    C: int
    Rse: int
    TE: int
    TEd: int
    kind: str = "transport"


def build_alecg_fused_plan(system, geom, edget, TF: int = 512,
                           W: int = 1024, force_e=None, force_d=None):
    """Host-side plan, or None when the configuration doesn't qualify
    (non-transport flux, time-dependent velocity, diffusion)."""
    if getattr(system, "ncomp", 0) == 5 and hasattr(system, "eos"):
        return _build_compflow_alecg_plan(system, geom, edget, TF, W,
                                          force_e, force_d)
    prob = _qualifies(system, geom.coords)
    if prob is None or geom.coords_n is None:
        return None

    TF, W = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    inpoelT = np.asarray(geom.inpoelT)
    E = inpoelT.shape[1]
    eplan = build_node_plan(inpoelT.T, geom.nnode, TF=TF, W=W,
                            dtype=dtype, force=force_e)
    edges = np.asarray(edget.edges)                   # (2, nE)
    nE = edges.shape[1]
    dplan = build_node_plan(edges.T, geom.nnode, TF=TF, W=W,
                            dtype=dtype, force=force_d)

    C = system.ncomp
    TE = TF // 4
    TEd = TF // 2
    Rse = 13 + 12 * C
    estat = np.zeros((Rse, eplan.ntile * TE), dtype)
    grad = np.asarray(geom.grad, np.float64)
    Jm = np.asarray(geom.J, np.float64) * np.asarray(geom.emask,
                                                     np.float64)
    cn = np.asarray(geom.coords_n, np.float64)
    for b in range(4):
        for j in range(3):
            estat[3 * b + j, :E] = grad[b, j]
    estat[12, :E] = Jm / 24.0                         # V/4
    for b in range(4):
        vn = np.asarray(prob.velocity(jnp.asarray(cn[b]), 0.0),
                        np.float64)                   # (C, 3, E)
        for c in range(C):
            for j in range(3):
                estat[13 + (b * C + c) * 3 + j, :E] = vn[c, j]

    # static edge weight: A_ab * lambda_ab (transport charspeed reads
    # only the coordinates)
    xyz = np.asarray(edget.xyz, np.float64)           # (2, 3, nE)
    lam = np.maximum(
        np.asarray(system.charspeed(jnp.zeros((C, nE)),
                                    jnp.asarray(xyz[0]))),
        np.asarray(system.charspeed(jnp.zeros((C, nE)),
                                    jnp.asarray(xyz[1]))),
    )
    dstat = np.zeros((1, dplan.ntile * TEd), dtype)
    dstat[0, :nE] = np.asarray(edget.A, np.float64) * lam

    return ALECGFusedPlan(eplan=eplan, dplan=dplan,
                          estat=jnp.asarray(estat),
                          dstat=jnp.asarray(dstat),
                          C=C, Rse=Rse, TE=TE, TEd=TEd)


def _build_compflow_alecg_plan(system, geom, edget, TF, W,
                                force_e, force_d):
    """Compflow flavor: the Euler flux and edge charspeed trace
    in-kernel from the corner states; estat = [grad 12 | w=J*emask/24 |
    emask] and dstat = [A | valid] (pads blend to a safe rho=1 state —
    the EoS divides by rho)."""
    TF, W = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    inpoelT = np.asarray(geom.inpoelT)
    E = inpoelT.shape[1]
    eplan = build_node_plan(inpoelT.T, geom.nnode, TF=TF, W=W,
                            dtype=dtype, force=force_e)
    edges = np.asarray(edget.edges)
    nE = edges.shape[1]
    dplan = build_node_plan(edges.T, geom.nnode, TF=TF, W=W,
                            dtype=dtype, force=force_d)
    C = 5
    TE = TF // 4
    TEd = TF // 2
    Rse = 14
    estat = np.zeros((Rse, eplan.ntile * TE), dtype)
    grad = np.asarray(geom.grad, np.float64)
    Jm = np.asarray(geom.J, np.float64) * np.asarray(geom.emask,
                                                     np.float64)
    for b in range(4):
        for j in range(3):
            estat[3 * b + j, :E] = grad[b, j]
    estat[12, :E] = Jm / 24.0
    estat[13, :E] = np.asarray(geom.emask, np.float64)
    dstat = np.zeros((2, dplan.ntile * TEd), dtype)
    dstat[0, :nE] = np.asarray(edget.A, np.float64)
    dstat[1, :nE] = 1.0
    return ALECGFusedPlan(eplan=eplan, dplan=dplan,
                          estat=jnp.asarray(estat),
                          dstat=jnp.asarray(dstat),
                          C=C, Rse=Rse, TE=TE, TEd=TEd,
                          kind="compflow")


def _make_vol_kernel_cf(TF, TE, W, FTS, C, system):
    from ..pde.problems.compflow import euler_flux_dir

    eos = system.eos

    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fv_ref, fpos_ref,
               stat_ref, lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos, FTS)
        hots = _corner_hots(TF, TE, un.dtype)
        una = _corners(un, hots)
        stat = stat_ref[...]
        m = stat[13:14, :]
        una = _safe_state(una, m, C, TE, un.dtype)
        divF = jnp.zeros((C, TE), un.dtype)
        for bb in range(4):
            p_b = eos.pressure_cons_cm(una[bb])
            for j in range(3):
                g = stat[3 * bb + j:3 * bb + j + 1, :]
                divF = divF + g * euler_flux_dir(una[bb], p_b, j)
        cv = -stat[12:13, :] * divF
        x = _to_slots([cv, cv, cv, cv], hots)

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
        far_ref[...] = _far_emit(x, fpos, FTS, TF)

    return kernel


def _make_edge_kernel_cf(TF, TEd, W, FTS, C, system):
    def charspeed(u):
        # the system's own law (|v|+c with the p>=0 clamp) traces
        # in-kernel; xyz is unused by the compflow charspeed
        return system.charspeed(u, None)

    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fv_ref, fpos_ref,
               stat_ref, lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos, FTS)
        hots = _corner_hots(TF, TEd, un.dtype, k=2)
        ua, ub = _corners(un, hots)
        stat = stat_ref[...]
        m = stat[1:2, :]
        ua, ub = _safe_state([ua, ub], m, C, TEd, un.dtype)
        lam = jnp.maximum(charspeed(ua), charspeed(ub))
        d = stat[0:1, :] * lam * (ub - ua)
        x = _to_slots([d, -d], hots)

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
        far_ref[...] = _far_emit(x, fpos, FTS, TF)

    return kernel


def _make_vol_kernel(TF, TE, W, FTS, C):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fv_ref, fpos_ref,
               stat_ref, lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos, FTS)
        hots = _corner_hots(TF, TE, un.dtype)
        una = _corners(un, hots)
        stat = stat_ref[...]
        divF = jnp.zeros((C, TE), un.dtype)
        for bb in range(4):
            for j in range(3):
                g = stat[3 * bb + j:3 * bb + j + 1, :]
                v = jnp.stack([stat[13 + (bb * C + c) * 3 + j, :]
                               for c in range(C)])
                divF = divF + g * v * una[bb]
        cv = -stat[12:13, :] * divF                    # (C, TE)
        x = _to_slots([cv, cv, cv, cv], hots)

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
        far_ref[...] = _far_emit(x, fpos, FTS, TF)

    return kernel


def _make_edge_kernel(TF, TEd, W, FTS, C):
    def kernel(blk_ref, ks_ref, ulo_ref, uhi_ref, fv_ref, fpos_ref,
               stat_ref, lo_ref, hi_ref, far_ref):
        t = pl.program_id(0)
        b = blk_ref[t]
        fresh = (t == 0) | (b != blk_ref[jnp.maximum(t - 1, 0)])

        @pl.when(fresh)
        def _():
            lo_ref[...] = jnp.zeros_like(lo_ref)
            hi_ref[...] = jnp.zeros_like(hi_ref)

        ks = ks_ref[0, :]
        fpos = fpos_ref[0, :]
        un = _window_gather(ks, b, TF, W, ulo_ref[...], uhi_ref[...],
                            fv_ref[...], fpos, FTS)
        hots = _corner_hots(TF, TEd, un.dtype, k=2)
        ua, ub = _corners(un, hots)                    # (C, TEd) each
        w = stat_ref[0:1, :]
        d = w * (ub - ua)
        x = _to_slots([d, -d], hots)

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
        far_ref[...] = _far_emit(x, fpos, FTS, TF)

    return kernel


def _sum_pass(kernel, p: NodePlan, stat, srows, TEx, U, interpret):
    C = U.shape[0]
    Up = _pad_u(p, U)
    fv = U[:, p.gfidx]
    in_specs = [
        pl.BlockSpec((1, p.TF), lambda t, blk: (0, t)),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t])),
        pl.BlockSpec((C, p.W), lambda t, blk: (0, blk[t] + 1)),
        pl.BlockSpec((C, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((1, p.FTS), lambda t, blk: (0, t)),
        pl.BlockSpec((srows, TEx), lambda t, blk: (0, t)),
    ]
    lo, hi, far = _call_windowed(
        kernel, p, C, (p.ks, Up, Up, fv, p.gfpos, stat), in_specs,
        interpret, U.dtype)
    lo = jnp.where(p.mlo > 0, lo, 0.0)
    hi = jnp.where(p.mhi > 0, hi, 0.0)
    near = (lo + hi)[:, :p.N]
    return near + _far_fold_add(p, far, interpret)


def alecg_rhs_fused(fp: ALECGFusedPlan, u, interpret=None,
                    system=None):
    """Stage rhs (C, N): volume pass + edge-dissipation pass; the
    compflow kind traces the Euler flux and charspeed in-kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = fp.C
    if fp.kind == "compflow":
        vol = _sum_pass(
            _make_vol_kernel_cf(fp.eplan.TF, fp.TE, fp.eplan.W,
                                fp.eplan.FTS, C, system),
            fp.eplan, fp.estat, fp.Rse, fp.TE, u, interpret)
        dis = _sum_pass(
            _make_edge_kernel_cf(fp.dplan.TF, fp.TEd, fp.dplan.W,
                                 fp.dplan.FTS, C, system),
            fp.dplan, fp.dstat, 2, fp.TEd, u, interpret)
        return vol + dis
    vol = _sum_pass(
        _make_vol_kernel(fp.eplan.TF, fp.TE, fp.eplan.W, fp.eplan.FTS,
                         C),
        fp.eplan, fp.estat, fp.Rse, fp.TE, u, interpret)
    dis = _sum_pass(
        _make_edge_kernel(fp.dplan.TF, fp.TEd, fp.dplan.W,
                          fp.dplan.FTS, C),
        fp.dplan, fp.dstat, 1, fp.TEd, u, interpret)
    return vol + dis


def build_alecg_fused_plan_stacked(system, sharded, TF: int = 512,
                                   W: int = 1024):
    """Per-shard fused ALECG plans with forced-uniform dims, stacked on
    a leading shard axis (the stacked forced-uniform pattern).  Pad edges
    carry A = 0 so their slots (keyed at local node 0) contribute
    exactly zero to the sum assembly."""
    cg = sharded.cg
    geom = cg.geom
    is_compflow = (getattr(system, "ncomp", 0) == 5
                   and hasattr(system, "eos"))
    if not is_compflow:
        if _qualifies(system, np.asarray(geom.coords)[0]) is None:
            return None
        if geom.coords_n is None:
            return None
    S = cg.nshard
    TFd, Wd = _env_dims(TF, W)
    dtype = np.dtype(np.asarray(geom.vol).dtype)
    Nl = int(geom.coords.shape[-1])

    nats_e = [build_node_plan(np.asarray(geom.inpoelT[s]).T, Nl,
                              TF=TFd, W=Wd, dtype=dtype)
              for s in range(S)]
    nats_d = [build_node_plan(np.asarray(sharded.edgesT[s]).T, Nl,
                              TF=TFd, W=Wd, dtype=dtype)
              for s in range(S)]

    def _force(nats):
        return dict(
            ntile=max(q.ntile for q in nats),
            nblk=max(q.nblk for q in nats),
            FTS=max(q.FTS for q in nats),
            ntileF=max(q.ntileF for q in nats),
            nblkF=max(q.nblkF for q in nats),
            WF=max(q.WF for q in nats),
        )

    force_e, force_d = _force(nats_e), _force(nats_d)

    from ..pde.cg import CGGeom

    fps = []
    for s in range(S):
        g = CGGeom(
            coords=geom.coords[s], inpoelT=geom.inpoelT[s],
            J=geom.J[s], grad=geom.grad[s], vol=geom.vol[s],
            emask=geom.emask[s], nsup=geom.nsup[s], nnode=Nl,
            plan=None, coords_n=geom.coords_n[s], ctr=geom.ctr[s],
        )

        class _ET:
            edges = sharded.edgesT[s]
            A = sharded.eA[s]
            xyz = sharded.exyz[s]

        fp = build_alecg_fused_plan(system, g, _ET, TF=TF, W=W,
                                    force_e=force_e, force_d=force_d)
        if fp is None:
            return None
        fps.append(dataclasses.replace(
            fp,
            eplan=dataclasses.replace(fp.eplan, nfar=-1),
            dplan=dataclasses.replace(fp.dplan, nfar=-1)))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fps)
