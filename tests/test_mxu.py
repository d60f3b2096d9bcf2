"""Exact-split one-hot MXU dots (ops/mxu.py).

The f32 bf16x3 split must (a) select EXACTLY (gathers through a one-hot
are bit-identical to direct indexing) and (b) accumulate scatter-sums
within a few ulps of the precision="highest" path.  The CPU test tier
runs f64 where the split is inactive, so this file exercises f32
explicitly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quinoa_tpu.ops.mxu import onehot_dot, onehot_dotT


@pytest.fixture
def f32_data():
    rng = np.random.default_rng(42)
    scale = 10.0 ** rng.integers(-6, 6, (20, 128))
    v = jnp.asarray((rng.standard_normal((20, 128)) * scale)
                    .astype(np.float32))
    idx = rng.integers(0, 64, 128)
    return v, idx


def _flag(val):
    old = os.environ.get("QUINOA_BF16_ONEHOT")
    os.environ["QUINOA_BF16_ONEHOT"] = val
    return old


def _restore(old):
    if old is None:
        os.environ.pop("QUINOA_BF16_ONEHOT", None)
    else:
        os.environ["QUINOA_BF16_ONEHOT"] = old


def test_gather_selection_bit_exact(f32_data):
    v, idx = f32_data
    w = v[:, :64]
    sel = jnp.asarray((np.arange(64)[:, None] == idx[None, :])
                      .astype(np.float32))
    old = _flag("1")
    try:
        g = onehot_dot(w, sel)
        gT = onehot_dotT(w, sel.T)
    finally:
        _restore(old)
    direct = np.asarray(w)[:, idx]
    assert (np.asarray(g) == direct).all()
    assert (np.asarray(gT) == direct).all()


def test_scatter_sum_ulp_close(f32_data):
    v, idx = f32_data
    hot = jnp.asarray((idx[:, None] == np.arange(64)[None, :])
                      .astype(np.float32))
    old = _flag("1")
    try:
        a = onehot_dot(v, hot)
    finally:
        _restore(old)
    old = _flag("0")
    try:
        b = onehot_dot(v, hot)
    finally:
        _restore(old)
    rel = np.abs(np.asarray(a - b)) / (np.abs(np.asarray(b)) + 1e-30)
    assert rel.max() < 5e-6, rel.max()


def test_f64_falls_back_exact():
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((8, 32)))
    assert v.dtype == jnp.float64
    idx = rng.integers(0, 16, 32)
    hot = jnp.asarray((idx[:, None] == np.arange(16)[None, :])
                      .astype(np.float64))
    old = _flag("1")
    try:
        a = onehot_dot(v, hot)
    finally:
        _restore(old)
    old = _flag("0")
    try:
        b = onehot_dot(v, hot)
    finally:
        _restore(old)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_fused_face_pass_f32_split_matches_unsplit():
    """The full near/far fused DG face pass at f32: split vs highest
    differ only at accumulation-ulp level (the gather side is exact;
    the contribution sums reorder)."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import hilbert_element_reorder
    from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.ops.face_accum import build_accum_plan
    from quinoa_tpu.ops.face_fused import fused_face_pass_nearfar
    from quinoa_tpu.pde.dg import dg_initialize

    mesh = box_tet_mesh(6, 6, 6, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc, dtype=np.float32)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    plan = build_accum_plan(geom)
    U = dg_initialize(system, geom, 0.0).astype(jnp.float32)

    old = _flag("1")
    try:
        acc1, delt1 = fused_face_pass_nearfar(system, geom, plan, U,
                                              interpret=True)
    finally:
        _restore(old)
    old = _flag("0")
    try:
        acc0, delt0 = fused_face_pass_nearfar(system, geom, plan, U,
                                              interpret=True)
    finally:
        _restore(old)
    a0, a1 = np.asarray(acc0), np.asarray(acc1)
    scale = np.abs(a0).max()
    assert np.allclose(a1, a0, atol=5e-6 * scale), \
        np.abs(a1 - a0).max() / scale
    assert np.allclose(np.asarray(delt1), np.asarray(delt0),
                       rtol=1e-5, atol=1e-6)
