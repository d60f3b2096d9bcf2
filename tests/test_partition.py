"""Partitioning algorithms: all five reference options
(PartitioningAlgorithm.hpp:61-65: rcb/rib/hsfc/mj/phg) implemented over
element centroids (ZoltanInterOp.cpp:29-133 analog)."""

import numpy as np
import pytest

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.parallel.partition import partition_elements

ALGOS = ["sfc", "hsfc", "rcb", "rib", "mj", "phg"]


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))


@pytest.mark.parametrize("algo", ALGOS)
@pytest.mark.parametrize("nparts", [2, 5, 8])
def test_balanced_cover(mesh, algo, nparts):
    part = partition_elements(mesh.coords, mesh.inpoel, nparts, algo)
    assert part.shape == (mesh.nelem,)
    assert part.min() == 0 and part.max() == nparts - 1
    counts = np.bincount(part, minlength=nparts)
    # equal-count up to +-1 for the geometric methods; phg grows to the
    # exact same targets
    assert counts.max() - counts.min() <= 1, (algo, counts)


@pytest.mark.parametrize("algo", ALGOS)
def test_deterministic(mesh, algo):
    a = partition_elements(mesh.coords, mesh.inpoel, 4, algo)
    b = partition_elements(mesh.coords, mesh.inpoel, 4, algo)
    np.testing.assert_array_equal(a, b)


def _cut_faces(mesh, part):
    from quinoa_tpu.mesh.derived import gen_esuel

    esuel = np.asarray(gen_esuel(mesh.inpoel, mesh.coords.shape[0]))
    cut = 0
    for i in range(4):
        nb = esuel[:, i]
        ok = nb >= 0
        cut += int((part[ok] != part[nb[ok]]).sum())
    return cut // 2


def test_rib_handles_rotated_cloud():
    """RIB's inertial axis finds the long direction of a rotated slab
    where RCB (axis-aligned) must cut obliquely."""
    rng = np.random.default_rng(0)
    pts = rng.random((4000, 3)) * [10.0, 1.0, 1.0]
    th = np.pi / 4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    pts = pts @ R.T
    from quinoa_tpu.parallel.partition import rib_partition

    part = rib_partition(pts, 2)
    # each half's extent along the long (rotated) axis is ~halved
    proj = pts @ R[:, 0]
    lo, hi = proj[part == 0], proj[part == 1]
    assert max(lo.max() - lo.min(), hi.max() - hi.min()) < 0.65 * (
        proj.max() - proj.min())


def test_phg_cut_quality(mesh):
    """Greedy graph growing should not cut more faces than the SFC
    baseline by more than a small factor (it is usually better)."""
    sfc = partition_elements(mesh.coords, mesh.inpoel, 8, "sfc")
    phg = partition_elements(mesh.coords, mesh.inpoel, 8, "phg")
    assert _cut_faces(mesh, phg) <= 1.5 * _cut_faces(mesh, sfc)


def test_unknown_algorithm():
    m = box_tet_mesh(2, 2, 2)
    with pytest.raises(ValueError):
        partition_elements(m.coords, m.inpoel, 2, "nope")


def test_weighted_sfc_partition_balances():
    """Weighted SFC split: per-part weight within one max-element-weight
    of the ideal share even when weights are strongly skewed (the
    dynamic-LB splitter behind --lbfreq)."""
    import numpy as np

    from quinoa_tpu.parallel.partition import morton_partition

    rng = np.random.default_rng(5)
    pts = rng.random((4000, 3))
    w = np.where(pts[:, 0] < 0.5, 4.0, 1.0)  # left half 4x heavier
    part = morton_partition(pts, 4, weights=w)
    per = np.bincount(part, weights=w, minlength=4)
    ideal = w.sum() / 4
    assert np.abs(per - ideal).max() <= w.max() + 1e-9
    # the unweighted split is materially imbalanced on the same input
    per0 = np.bincount(morton_partition(pts, 4), weights=w, minlength=4)
    assert np.abs(per0 - ideal).max() > 10 * w.max()


def test_weighted_sfc_partition_never_empty():
    """A single element heavier than a whole weight window must not
    leave any part empty (the repair pass in morton_partition)."""
    import numpy as np

    from quinoa_tpu.parallel.partition import morton_partition

    rng = np.random.default_rng(1)
    pts = rng.random((200, 3))
    w = np.ones(200)
    w[17] = 1000.0
    for nparts in (4, 8, 16):
        cnt = np.bincount(morton_partition(pts, nparts, weights=w),
                          minlength=nparts)
        assert (cnt > 0).all()
