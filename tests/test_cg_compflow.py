"""CG compressible-flow (Euler) tests: manufactured solutions + Sod.

Mirrors the reference regression coverage (tests/regression/inciter/
compflow/Euler/...): analytic-error diagnostics after real time stepping.
Layout: all fields component-major (C, N).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.cg import make_cggeom
from quinoa_tpu.pde.cg_compflow import CGCompFlow
from quinoa_tpu.pde.problems import (
    VorticalFlow,
    TaylorGreen,
    SodShocktube,
    SedovBlastwave,
    NLEnergyGrowth,
    RayleighTaylor,
)
from quinoa_tpu.pde.problems.compflow import euler_flux_dir
from quinoa_tpu.inciter import DiagCGSolver, Diagnostics


def test_taylor_green_autodiff_source():
    """The autodiff source must equal the reference's closed form:
    (0,0,0,0, 3*pi/8*(cos(3pix)cos(piy) - cos(3piy)cos(pix)))
    (TaylorGreen.cpp:77-90, gamma=5/3)."""
    prob = TaylorGreen()
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(0, 1, size=(3, 20)))
    s = np.asarray(prob.src(xyz, 0.0))
    x, y = np.asarray(xyz[0]), np.asarray(xyz[1])
    se = (
        3.0 * np.pi / 8.0
        * (np.cos(3 * np.pi * x) * np.cos(np.pi * y)
           - np.cos(3 * np.pi * y) * np.cos(np.pi * x))
    )
    assert np.allclose(s[:4], 0.0, atol=1e-10)
    assert np.allclose(s[4], se, atol=1e-10)


def test_euler_flux_dir_consistency():
    """Flux columns satisfy F_j . n = normal flux identities."""
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.uniform(0.5, 2.0, size=(5, 7)))
    U = U.at[4].add(5.0)
    prob = VorticalFlow()
    p = prob.eos.pressure_cons_cm(U)
    F0 = np.asarray(euler_flux_dir(U, p, 0))
    # mass flux in x = x-momentum
    assert np.allclose(F0[0], np.asarray(U[1]))
    # energy flux = (E+p) u
    assert np.allclose(F0[4], np.asarray((U[4] + p) * U[1] / U[0]))


@pytest.mark.parametrize(
    "problem,steps,tol",
    [
        (VorticalFlow(), 10, 0.05),
        (TaylorGreen(), 10, 0.05),
        (RayleighTaylor(), 10, 0.12),
    ],
)
@pytest.mark.slow
def test_manufactured_stays_on_solution(problem, steps, tol):
    """Starting from the manufactured solution, the numerical solution
    must stay near it on a coarse mesh."""
    mesh = box_tet_mesh(6, 6, 6, lo=(-0.5, -0.5, -0.5), hi=(0.5, 0.5, 0.5))
    if isinstance(problem, TaylorGreen):
        mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.33))
    system = CGCompFlow(problem)
    solver = DiagCGSolver(system, make_cggeom(mesh), cfl=0.5,
                          bcnodes=mesh.all_bnodes())
    s = solver.initial_state()
    diag = Diagnostics(system, solver.geom)
    s = solver.nsteps(s, steps)
    row = diag.compute(s)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    scale = max(row.l2sol)
    for c in range(5):
        denom = max(row.l2sol[c], 0.01 * scale)
        assert row.l2err[c] / denom < tol, (c, row.l2err[c], denom)


@pytest.mark.slow
def test_nleg_runs_finite():
    mesh = box_tet_mesh(5, 5, 5, lo=(-0.5, -0.5, -0.5), hi=(0.5, 0.5, 0.5))
    system = CGCompFlow(NLEnergyGrowth())
    solver = DiagCGSolver(system, make_cggeom(mesh), cfl=0.4,
                          bcnodes=mesh.all_bnodes())
    s = solver.nsteps(solver.initial_state(), 5)
    assert np.isfinite(np.asarray(s.u)).all()
    assert float(s.t) > 0


def test_sod_shocktube_cg_smoke():
    """Sod on CG: smoke only (the reference runs Sod exclusively with DG
    because CG lacks the wall BCs the tube needs)."""
    mesh = box_tet_mesh(32, 2, 2, hi=(1.0, 0.0625, 0.0625))
    prob = SodShocktube()
    system = CGCompFlow(prob)
    solver = DiagCGSolver(system, make_cggeom(mesh), cfl=0.4)
    s = solver.nsteps(solver.initial_state(), 10)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert u[0].min() > 0.0  # density stays positive
    assert np.abs(u[1]).max() > 0.02  # flow developed
    assert float(s.t) > 0.01


def test_sedov_ignition_finite():
    mesh = box_tet_mesh(8, 8, 2, hi=(0.4, 0.4, 0.1))
    system = CGCompFlow(SedovBlastwave())
    solver = DiagCGSolver(system, make_cggeom(mesh), cfl=0.2)
    s = solver.nsteps(solver.initial_state(), 10)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert u[0].min() > 0


def test_alecg_vortical_flow():
    """ALECG (full RK3 scheme for the reference's scaffold) with the
    nodal-quadrature manufactured source: stays on the VorticalFlow
    solution to <1% component-relative error over 10 steps."""
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(6, 6, 6, lo=(-0.5, -0.5, -0.5), hi=(0.5, 0.5, 0.5))
    system = CGCompFlow(VorticalFlow())
    solver = make_alecg(system, mesh, cfl=0.6, bcnodes=mesh.all_bnodes())
    s = solver.nsteps(solver.initial_state(), 10)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    from quinoa_tpu.inciter import Diagnostics
    row = Diagnostics(system, solver.geom).compute(s)
    scale = max(row.l2sol)
    for c in range(5):
        assert row.l2err[c] / max(row.l2sol[c], 0.01 * scale) < 0.01, (c,)


def test_alecg_sod_stable():
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(24, 2, 2, hi=(1.0, 0.0833, 0.0833))
    prob = SodShocktube()
    solver = make_alecg(CGCompFlow(prob), mesh, cfl=0.5)
    s = solver.nsteps(solver.initial_state(), 20)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert u[0].min() > 0.05  # density stays positive under edge Rusanov
    assert np.abs(u[1]).max() > 0.02
