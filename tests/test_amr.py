"""h-AMR tests: templates conserve volume, meshes stay conforming and
leak-free, solution transfer is exact for P1, and a dtref cycle improves
resolution where the error indicator fires.

Mirrors the reference's AMR coverage (tests/unit/Inciter/AMR/TestError.cpp
+ the t0ref/dtref regression suites) at unit scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quinoa_tpu.mesh import box_tet_mesh, tet_geometry, gen_esuel, gen_inpoed
from quinoa_tpu.mesh.derived import leaky_partition
from quinoa_tpu.amr import (
    compatible_tags,
    refine_mesh,
    uniform_refine,
    edge_errors,
    tag_edges_by_error,
    tag_edges_by_coords,
)
from quinoa_tpu.amr.refine import transfer_cg


def _total_volume(mesh):
    J, _ = tet_geometry(mesh.coords, mesh.inpoel)
    assert (J > 0).all()
    return J.sum() / 6.0


def _check_valid(mesh):
    """Conforming (every interior face shared by exactly 2 tets) and
    boundary-leak-free (closed surface integral)."""
    esuel = gen_esuel(mesh.inpoel, mesh.nnode)
    assert not leaky_partition(esuel, mesh.inpoel, mesh.coords)
    # boundary faces of the volume mesh == union of side-set faces
    nbnd_vol = int((esuel < 0).sum())
    nbnd_ss = sum(len(v) for v in mesh.bface.values())
    assert nbnd_vol == nbnd_ss


def test_uniform_refine_conserves_volume():
    mesh = box_tet_mesh(2, 2, 2)
    v0 = _total_volume(mesh)
    ref, rmap = uniform_refine(mesh)
    assert ref.nelem == 8 * mesh.nelem
    assert np.isclose(_total_volume(ref), v0)
    _check_valid(ref)
    assert rmap.parent.shape[0] == ref.nelem


def test_single_edge_refine_compatible():
    """Tagging one edge produces a small, conforming refinement zone."""
    mesh = box_tet_mesh(2, 2, 2)
    edges = gen_inpoed(mesh.inpoel)
    tag = edges[[7]]
    ref, rmap = refine_mesh(mesh, tag)
    assert ref.nelem > mesh.nelem
    assert np.isclose(_total_volume(ref), _total_volume(mesh))
    _check_valid(ref)


def test_compatibility_closure_patterns():
    mesh = box_tet_mesh(2, 2, 2)
    edges = gen_inpoed(mesh.inpoel)
    closed = compatible_tags(mesh.inpoel, edges[:5])
    # closure only adds edges
    k0 = {tuple(e) for e in np.sort(edges[:5], axis=1).tolist()}
    k1 = {tuple(e) for e in np.sort(closed, axis=1).tolist()}
    assert k0 <= k1
    # and the closed set refines into a valid mesh
    ref, _ = refine_mesh(mesh, closed)
    _check_valid(ref)


def test_transfer_cg_exact_for_linear():
    """P1 interpolation transfer reproduces a linear field exactly."""
    mesh = box_tet_mesh(3, 3, 3)
    f = lambda x: 1.0 + 2 * x[:, 0] - 0.5 * x[:, 1] + 3 * x[:, 2]
    u = f(mesh.coords)[None, :]
    ref, rmap = uniform_refine(mesh)
    u2 = transfer_cg(rmap, u)
    assert np.allclose(u2[0], f(ref.coords), atol=1e-14)


def test_coordref_tags_halfspace():
    mesh = box_tet_mesh(4, 4, 4)
    tags = tag_edges_by_coords(mesh, xminus=0.5)
    assert len(tags) > 0
    assert (mesh.coords[tags.ravel(), 0] < 0.5).all()
    ref, _ = refine_mesh(mesh, tags)
    _check_valid(ref)
    assert ref.nelem > mesh.nelem


def test_jump_error_flags_discontinuity():
    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.33))
    u = (mesh.coords[:, 0] > 0.5).astype(float)[None, :]
    err = edge_errors(mesh, u, method="jump")
    edges = gen_inpoed(mesh.inpoel)
    crossing = u[0, edges[:, 0]] != u[0, edges[:, 1]]
    assert crossing.any()
    assert (err[crossing] > 0.9).all()
    assert (err[~crossing] < 0.1).all()


def test_dtref_cycle_slotcyl():
    """A during-timestep refinement cycle: run CG transport, tag by jump
    error, refine, transfer, keep running — the Refiner dtref analog."""
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver

    mesh = box_tet_mesh(8, 8, 2, hi=(1.0, 1.0, 0.25))
    system = CGTransport(SlotCyl())
    solver = DiagCGSolver(system, make_cggeom(mesh), const_dt=1e-3)
    s = solver.nsteps(solver.initial_state(), 3)

    tags = tag_edges_by_error(mesh, np.asarray(s.u), tol=0.2)
    assert len(tags) > 0
    ref, rmap = refine_mesh(mesh, tags)
    u2 = transfer_cg(rmap, np.asarray(s.u))
    assert u2.shape[1] == ref.nnode

    solver2 = DiagCGSolver(system, make_cggeom(ref), const_dt=1e-3)
    s2 = solver2.initial_state(t0=float(s.t))
    s2 = type(s2)(u=jnp.asarray(u2), t=s2.t, it=s.it, dt=s.dt)
    s2 = solver2.nsteps(s2, 3)
    u = np.asarray(s2.u)
    assert np.isfinite(u).all()
    assert u.min() > -1e-8 and u.max() < 0.6 + 1e-8  # FCT bounds survive
