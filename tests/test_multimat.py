"""Multi-material DG(P0) tests: interface advection preserves the bulk
state; two-material Sod develops the shock with bounded fractions.

Mirrors tests/regression/inciter/multimat/{InterfaceAdvection,SodShocktube}.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY, BC_EXTRAPOLATE, BC_DIRICHLET
from quinoa_tpu.pde.multimat import (
    MultiMatSystem, MultiMatSolver, volfrac_idx, density_idx, momentum_idx,
    energy_idx,
)
from quinoa_tpu.pde.problems.multimat import MMInterfaceAdvection, MMSodShocktube


@pytest.mark.slow
def test_interface_advection_uniform_flow():
    """Uniform p, T, velocity with a material interface: pressure and
    velocity must stay (nearly) uniform — the standard interface-advection
    consistency check for multimat schemes."""
    prob = MMInterfaceAdvection(nmat=3)
    system = MultiMatSystem(prob)
    mesh = box_tet_mesh(8, 8, 2, hi=(1.0, 1.0, 0.25))
    geom = build_dggeom(mesh, ndof=1,
                        bc_sidesets={i: BC_DIRICHLET for i in range(1, 7)})
    solver = MultiMatSolver(system, geom, cfl=0.4)
    s = solver.nsteps(solver.initial_state(), 10)
    u = np.asarray(s.u)
    nmat = 3
    assert np.isfinite(u).all()
    # volume fractions stay in [~0, ~1] and sum to ~1
    alpha = u[:nmat]
    assert alpha.min() > -1e-8
    assert np.abs(alpha.sum(axis=0) - 1.0).max() < 1e-6
    # velocity stays uniform (interface advection preserves u, p)
    rho = u[nmat:2 * nmat].sum(axis=0)
    vx = u[momentum_idx(nmat, 0)] / rho
    vy = u[momentum_idx(nmat, 1)] / rho
    assert np.abs(vx - np.sqrt(50.0)).max() < 0.5
    assert np.abs(vy - np.sqrt(50.0)).max() < 0.5


def test_mm_sod_shock():
    prob = MMSodShocktube()
    system = MultiMatSystem(prob)
    mesh = box_tet_mesh(32, 2, 2, hi=(1.0, 0.0625, 0.0625))
    bc = {1: BC_EXTRAPOLATE, 2: BC_EXTRAPOLATE,
          3: BC_SYMMETRY, 4: BC_SYMMETRY, 5: BC_SYMMETRY, 6: BC_SYMMETRY}
    geom = build_dggeom(mesh, ndof=1, bc_sidesets=bc)
    solver = MultiMatSolver(system, geom, cfl=0.5)
    s = solver.nsteps(solver.initial_state(), 40)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    nmat = 2
    rho = u[nmat:2 * nmat].sum(axis=0)
    assert rho.min() > 0.1 and rho.max() < 1.05
    # x-momentum developed, shock moving right
    assert u[momentum_idx(nmat, 0)].max() > 0.05
    # fractions bounded
    a = u[:nmat]
    assert a.min() > -1e-8 and a.max() < 1.0 + 1e-8
    assert float(s.t) > 0.005


@pytest.mark.parametrize("nshard", [
    2, pytest.param(4, marks=pytest.mark.slow)])
def test_mm_spmd_matches_single(nshard):
    """Sharded multimat P0 (SPMDMultiMatSolver: DG ghost exchange + the
    multimat rhs) reproduces the single-device Sod run."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.parallel.dg_shard import build_dg_shards
    from quinoa_tpu.parallel.dg_spmd import SPMDMultiMatSolver

    prob = MMSodShocktube()
    system = MultiMatSystem(prob)
    mesh = box_tet_mesh(16, 2, 2, hi=(1.0, 0.125, 0.125))
    bc = {1: BC_EXTRAPOLATE, 2: BC_EXTRAPOLATE,
          3: BC_SYMMETRY, 4: BC_SYMMETRY, 5: BC_SYMMETRY, 6: BC_SYMMETRY}

    geom = build_dggeom(mesh, ndof=1, bc_sidesets=bc)
    s1solver = MultiMatSolver(system, geom, cfl=0.5)
    s1 = s1solver.nsteps(s1solver.initial_state(), 8)

    sharded = build_dg_shards(mesh, nshard, ndof=1, bc_sidesets=bc)
    dmesh = Mesh(np.array(jax.devices()[:nshard]), ("shard",))
    sN = SPMDMultiMatSolver(system, sharded, dmesh, cfl=0.5)
    st = sN.nsteps(sN.initial_state(), 8)

    assert np.isclose(float(np.asarray(st.t).ravel()[0]), float(s1.t), rtol=1e-12)
    uN = sN.gather_global(st)
    err = np.abs(uN - np.asarray(s1.u)).max()
    assert err < 1e-9, err
