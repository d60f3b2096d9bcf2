"""Exact 3-pass bf16 MXU dots for one-hot window kernels.

Every Pallas window kernel in this package contracts VALUE rows against
a 0/1 one-hot matrix (gather = values @ one-hot, scatter-accumulate =
contributions @ one-hot).  `precision="highest"` makes XLA emulate the
f32 matmul with ~6 bf16 MXU passes — but when one operand is EXACTLY
representable in bf16 (a 0/1 mask is), the f32 value side can be split
into three disjoint-mantissa bf16 terms

    v = v0 + v1 + v2      (8 + 8 + 8 = 24 mantissa bits, Dekker split)

and contracted with three native 1-pass bf16x bf16 -> f32 dots: half
the MXU passes of "highest" with EXACTLY the same selected values
(each product v_i * {0,1} is exact, and v0+v1+v2 reassembles v without
rounding).  Accumulated sums round at the same f32 accumulator width,
so scatter-sums differ from the "highest" path only at the usual
FMA-reordering ulp level.

The split is only exact for f32 (3x8 bits covers the 24-bit mantissa);
f64 inputs (the CPU test tier) fall back to precision="highest".
QUINOA_BF16_ONEHOT=0 restores the old path for A/B.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_split(dtype) -> bool:
    return (dtype == jnp.float32
            and os.environ.get("QUINOA_BF16_ONEHOT", "1") == "1")


def _split3(a):
    """f32 -> three bf16 terms whose (exact) sum is a."""
    a0 = a.astype(jnp.bfloat16)
    r = a - a0.astype(jnp.float32)
    a1 = r.astype(jnp.bfloat16)
    a2 = (r - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return a0, a1, a2


def onehot_dot(values, hot):
    """values (R, K) @ hot (K, M) -> (R, M); hot entries in {0, 1}.

    The contraction axis is chunked to 128: Mosaic fails to lower the
    bf16 matmul tiling for K > 128 (observed at W=256 windows, which
    stacked SPMD plans can reach via window doubling), and 128-wide
    chunks are exactly the MXU's native contraction tile anyway."""
    if not _use_split(values.dtype):
        return jax.lax.dot(values, hot, precision="highest")
    K = values.shape[1]
    dims = (((1,), (0,)), ((), ()))

    def d(a, h):
        # precision pinned to DEFAULT: bf16 x bf16 -> f32 is the native
        # single-pass MXU op and each product is exact regardless; an
        # ambient jax.default_matmul_precision("highest") context would
        # otherwise force a multi-pass bf16 lowering Mosaic rejects
        return jax.lax.dot_general(a, h, dims,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)

    out = None
    for k0 in range(0, K, 128):
        k1 = min(k0 + 128, K)
        v = jax.lax.slice_in_dim(values, k0, k1, axis=1)
        h = jax.lax.slice_in_dim(hot, k0, k1, axis=0) \
            .astype(jnp.bfloat16)
        a0, a1, a2 = _split3(v)
        part = d(a0, h) + d(a1, h) + d(a2, h)
        out = part if out is None else out + part
    return out


def onehot_dotT(values, hot):
    """values (R, W) x hot (M, W) -> (R, M), contracting W (the window
    axis of both); hot entries in {0, 1}.

    NOT split: Mosaic rejects the [1],[1]-contraction matmul for bf16
    operands ("tpu.matmul ... dot_dimension_numbers<[1], [1], ..." fails
    to lower).  Kernels that want the split must build the TRANSPOSED
    one-hot (an iota compare costs the same either way) and call
    onehot_dot — the fused face kernels do."""
    return jax.lax.dot_general(values, hot, (((1,), (1,)), ((), ())),
                               precision="highest")
