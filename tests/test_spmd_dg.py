"""SPMD DG vs single-shard results (ghost-exchange correctness).

The DG analog of the reference's asynclogic sweeps: identical physics on
1 shard and on a virtual multi-device mesh must agree to fp tolerance.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY, BC_EXTRAPOLATE
from quinoa_tpu.pde.dg_compflow import DGCompFlow, DGTransport
from quinoa_tpu.pde.problems import SodShocktube, SedovBlastwave, GaussHump
from quinoa_tpu.inciter.dg import DGSolver
from quinoa_tpu.parallel.dg_shard import build_dg_shards
from quinoa_tpu.parallel.dg_spmd import SPMDDGSolver


def _bc_sod():
    return {1: BC_EXTRAPOLATE, 2: BC_EXTRAPOLATE,
            3: BC_SYMMETRY, 4: BC_SYMMETRY, 5: BC_SYMMETRY, 6: BC_SYMMETRY}


@pytest.mark.parametrize("nshard,limiter", [
    (2, None),
    pytest.param(4, "superbeep1", marks=pytest.mark.slow),
    pytest.param(8, None, marks=pytest.mark.slow),
    pytest.param(8, "superbeep1", marks=pytest.mark.slow),
    pytest.param(8, "wenop1", marks=pytest.mark.slow),
])
def test_spmd_dg_matches_single(nshard, limiter):
    mesh = box_tet_mesh(10, 3, 3, hi=(1.0, 0.3, 0.3))
    prob = SodShocktube()
    system = DGCompFlow(prob, riemann_flux="hllc")

    geom1 = build_dggeom(mesh, ndof=4, bc_sidesets=_bc_sod())
    s1solver = DGSolver(system, geom1, cfl=0.5, limiter=limiter)
    s1 = s1solver.nsteps(s1solver.initial_state(), 3)

    sharded = build_dg_shards(mesh, nshard, ndof=4, bc_sidesets=_bc_sod())
    dmesh = Mesh(np.array(jax.devices()[:nshard]), ("shard",))
    sN = SPMDDGSolver(system, sharded, dmesh, cfl=0.5, limiter=limiter)
    st = sN.nsteps(sN.initial_state(), 3)

    assert np.isclose(float(np.asarray(st.t).ravel()[0]), float(np.asarray(s1.t).ravel()[0]), rtol=1e-12)
    uN = sN.gather_global(st)
    u1 = np.asarray(s1.u)
    err = np.abs(uN - u1).max()
    assert err < 1e-9, f"max |sharded - single| = {err}"


@pytest.mark.slow
def test_spmd_dg_sedov_diag():
    mesh = box_tet_mesh(6, 6, 2, hi=(0.3, 0.3, 0.1))
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    sharded = build_dg_shards(mesh, 4, ndof=4, bc_sidesets=bc)
    dmesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    solver = SPMDDGSolver(system, sharded, dmesh, cfl=0.5,
                          limiter="superbeep1")
    st = solver.nsteps(solver.initial_state(), 5)
    l2sol, l2err, linferr = solver.diagnostics(st)
    assert np.isfinite(l2sol).all()
    assert l2sol[0] > 0.5  # density norm ~1


def test_spmd_dg_transport():
    mesh = box_tet_mesh(8, 8, 2, hi=(1.0, 1.0, 0.25))
    from quinoa_tpu.pde.dg import BC_DIRICHLET
    bc = {i: BC_DIRICHLET for i in range(1, 7)}
    system = DGTransport(GaussHump())
    geom1 = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    s1solver = DGSolver(system, geom1, cfl=0.5)
    s1 = s1solver.nsteps(s1solver.initial_state(), 3)

    sharded = build_dg_shards(mesh, 8, ndof=4, bc_sidesets=bc)
    dmesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    sN = SPMDDGSolver(system, sharded, dmesh, cfl=0.5)
    st = sN.nsteps(sN.initial_state(), 3)
    err = np.abs(sN.gather_global(st) - np.asarray(s1.u)).max()
    assert err < 1e-10, err


@pytest.mark.parametrize("nshard", [
    2, pytest.param(4, marks=pytest.mark.slow)])
def test_spmd_pdg_matches_single(nshard):
    """p-adaptive DG over shards: the element-local eval_ndof indicator
    reaches identical decisions on owner and ghost copies, so the
    sharded run reproduces the single-device pDG run exactly."""
    from quinoa_tpu.pde.problems import GaussHump
    from quinoa_tpu.pde.dg_compflow import DGTransport
    from quinoa_tpu.pde.dg import BC_EXTRAPOLATE

    mesh = box_tet_mesh(8, 8, 2, hi=(1.0, 1.0, 0.25))
    bc = {i: BC_EXTRAPOLATE for i in range(1, 7)}
    system = DGTransport(GaussHump(ncomp=1))

    geom1 = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    s1solver = DGSolver(system, geom1, cfl=0.5, pref=True, tolref=0.2)
    s1 = s1solver.nsteps(s1solver.initial_state(), 3)
    assert int(np.asarray(s1.ndofel).min()) == 1  # adaptivity active
    assert int(np.asarray(s1.ndofel).max()) == 4

    sharded = build_dg_shards(mesh, nshard, ndof=4, bc_sidesets=bc)
    dmesh = Mesh(np.array(jax.devices()[:nshard]), ("shard",))
    sN = SPMDDGSolver(system, sharded, dmesh, cfl=0.5, pref=True,
                      tolref=0.2)
    st = sN.nsteps(sN.initial_state(), 3)

    assert np.isclose(float(np.asarray(st.t).ravel()[0]), float(np.asarray(s1.t).ravel()[0]), rtol=1e-12)
    uN = sN.gather_global(st)
    err = np.abs(uN - np.asarray(s1.u)).max()
    assert err < 1e-9, err
