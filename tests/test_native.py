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
