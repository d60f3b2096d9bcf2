"""Shared scaffolding for the fused window kernels (ops/alecg_fused.py).

A "window kernel" runs gather + entity math + assembly in ONE Pallas
pass: each tile reads nodal fields through an in-VMEM one-hot window
(ops/node_window.py plan), evaluates the per-entity math on corner /
endpoint blocks, and accumulates straight back into the node windows —
no entity slab ever touches HBM.  Far slots (node outside the tile
window) are emitted as a compact per-tile stream and folded in by the
target-sorted far pass (ops/face_accum._one_pass).

History: this toolkit was extracted from the retired fused DiagCG+FCT
megakernel (`ops/cg_fused.py`, rounds 3-4).  That path was measured on
silicon and permanently LOSES to the XLA DiagCG formulation (134 vs
110 ms/step at 48³ with the bf16 split; PERFORMANCE.md "DiagCG + FCT"
documents the floor analysis and the three failed formulations), so the
DiagCG kernels were deleted — ALECG is the scheme whose entity windows
are dense enough for the one-hot build to amortize (its fused path WINS
on silicon, +17%, and is default-on on TPU via ops/alecg_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import onehot_dot, onehot_dotT
from .face_accum import _one_pass
from .node_window import NodePlan


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
    """(R, TF) slot values -> list of per-corner (R, TE) blocks."""
    return [onehot_dot(u, h) for h in hots]


def _to_slots(xa, hots):
    """Per-corner (R, TE) blocks -> (R, TF) slot values."""
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


def _vmem_limit_bytes():
    """Scoped-vmem ceiling for the fused window kernels.  The entity
    math traced in-kernel needs more kernel stack than Mosaic's 16 MiB
    default (measured 21.8 MiB at the TF=512/W=1024 defaults on v5e);
    raise it, env-overridable."""
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
