"""Native C++ host kernels match the NumPy implementations exactly."""

import os

import numpy as np
import pytest

from quinoa_tpu import native
from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.mesh.derived import gen_esuel, gen_inpoed
from quinoa_tpu.ops.assembly import build_nsup
from quinoa_tpu.parallel.partition import _morton_codes, element_centroids


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(5, 4, 3)


def _numpy_esuel(inpoel, nnode):
    os.environ["QUINOA_TPU_NO_NATIVE"] = "1"
    try:
        import importlib
        import quinoa_tpu.native as qn

        qn._TRIED = True
        qn._LIB = None
        from quinoa_tpu.mesh import derived

        return derived.gen_esuel(inpoel, nnode)
    finally:
        os.environ.pop("QUINOA_TPU_NO_NATIVE", None)
        native._TRIED = False


def test_native_builds():
    assert native.lib() is not None, "native toolchain expected in image"


def test_esuel_matches(mesh):
    nat = native.gen_esuel(mesh.inpoel)
    ref = _numpy_esuel(mesh.inpoel, mesh.nnode)
    assert np.array_equal(nat, ref)


def test_nsup_matches(mesh):
    nat, D = native.build_nsup(mesh.inpoel, mesh.nnode)
    # recompute the reference table with the pure-NumPy algorithm inline
    E, A = mesh.inpoel.shape
    flat = mesh.inpoel.T.ravel()
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=mesh.nnode)
    Dref = int(counts.max())
    ref = np.full((Dref, mesh.nnode), A * E, dtype=np.int32)
    pos = np.zeros(mesh.nnode + 1, dtype=np.int64)
    np.cumsum(counts, out=pos[1:])
    idx = np.arange(len(flat)) - pos[flat[order]]
    ref[idx, flat[order]] = order.astype(np.int32)
    assert D == Dref
    assert np.array_equal(nat, ref)


def test_morton_matches(mesh):
    c = element_centroids(mesh.coords, mesh.inpoel)
    nat = native.morton_codes(c)
    ref = _morton_codes(c)
    assert np.array_equal(nat, ref.astype(np.uint64))


def test_native_tet_geometry_matches_numpy(mesh):
    if native.lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    c = mesh.coords + rng.normal(0, 0.01, mesh.coords.shape)
    inp = mesh.inpoel
    J, g = native.tet_geometry(c, inp)
    # inline NumPy reference (geometry.py's fallback formulas)
    xyz = c[inp]
    A = xyz[:, 0]
    ba, ca, da = xyz[:, 1] - A, xyz[:, 2] - A, xyz[:, 3] - A

    def cr(u, v):
        return np.stack([u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                         u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                         u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]], 1)

    baca = cr(ba, ca)
    Jr = np.einsum("ij,ij->i", baca, da)
    np.testing.assert_allclose(J, Jr, rtol=1e-14)
    gr = np.empty((len(Jr), 4, 3))
    gr[:, 1] = cr(ca, da) / Jr[:, None]
    gr[:, 2] = cr(da, ba) / Jr[:, None]
    gr[:, 3] = baca / Jr[:, None]
    gr[:, 0] = -(gr[:, 1] + gr[:, 2] + gr[:, 3])
    np.testing.assert_allclose(g, gr, rtol=1e-12, atol=1e-14)


def test_native_unique_edges_matches_numpy(mesh):
    if native.lib() is None:
        pytest.skip("no native toolchain")
    from quinoa_tpu.mesh.derived import _TET_EDGES
    e = np.sort(mesh.inpoel[:, _TET_EDGES].reshape(-1, 2), axis=1)
    ref = np.unique(e, axis=0)
    nat = native.unique_edges(mesh.inpoel)
    assert np.array_equal(ref, nat)


def test_native_coords_cache_and_volumes(mesh):
    if native.lib() is None:
        pytest.skip("no native toolchain")
    c, inp = mesh.coords, mesh.inpoel
    cn, ctr = native.coords_cache(c, inp)
    cn_ref = np.ascontiguousarray(c[inp].transpose(1, 2, 0))
    np.testing.assert_array_equal(cn, cn_ref)
    np.testing.assert_array_equal(ctr, cn_ref.mean(axis=0))
    from quinoa_tpu.mesh.geometry import tet_geometry
    J, _ = tet_geometry(c, inp)
    vol = native.nodal_volumes(J, inp, mesh.nnode)
    ref = np.bincount(inp.ravel(), weights=np.repeat(J / 24.0, 4),
                      minlength=mesh.nnode)
    np.testing.assert_allclose(vol, ref, rtol=1e-13)


def test_native_hilbert_codes_matches_numpy(mesh):
    if native.lib() is None:
        pytest.skip("no native toolchain")
    import quinoa_tpu.native as qn
    from quinoa_tpu.mesh import reorder

    pts = element_centroids(mesh.coords, mesh.inpoel)
    nat = reorder.hilbert_codes(pts)
    saveL, saveT = qn._LIB, qn._TRIED
    qn._LIB, qn._TRIED = None, True
    try:
        ref = reorder.hilbert_codes(pts)
    finally:
        qn._LIB, qn._TRIED = saveL, saveT
    assert np.array_equal(nat, ref)
