"""Particle tracking (src/Particles/Tracker.hpp analog): seeding,
point location by neighbor walking, advection accuracy, H5Part CLI
output."""

import numpy as np
import pytest

import jax.numpy as jnp

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.particles import ParticleTracker, seed_particles
from quinoa_tpu.particles.tracker import (analytic_velocity, barycentric,
                                          locate, make_tracker_geom,
                                          nodal_velocity)


def test_seed_inside_elements():
    mesh = box_tet_mesh(6, 6, 6)
    xp, ep = seed_particles(mesh, 500, seed=3)
    geom = make_tracker_geom(mesh)
    lam = np.asarray(barycentric(geom, jnp.asarray(xp), jnp.asarray(ep)))
    assert lam.min() >= -1e-12 and lam.max() <= 1.0 + 1e-12
    np.testing.assert_allclose(lam.sum(axis=0), 1.0, atol=1e-12)


def test_locate_walks_to_containing_element():
    """Start every particle's element guess at 0; the fixed-hop walk
    with enough hops must find the true containing element (verified
    by barycentric bounds)."""
    mesh = box_tet_mesh(5, 5, 5)
    xp, ep_true = seed_particles(mesh, 200, seed=1)
    geom = make_tracker_geom(mesh)
    ep0 = jnp.zeros(200, dtype=jnp.int32)
    ep = ep0
    # the guess is up to ~3*n hops away: iterate the 4-hop walk
    for _ in range(12):
        ep = locate(geom, jnp.asarray(xp), ep, hops=4)
    lam = np.asarray(barycentric(geom, jnp.asarray(xp), ep))
    assert (lam.min(axis=0) >= -1e-9).all()


def test_slotcyl_rotation_preserves_radius():
    """SlotCyl's velocity is solid-body rotation about (0.5, 0.5) in
    the x-y plane: tracked particles preserve their radius (RK2 ->
    O(dt^3) per step) and rotate with angular velocity pi/2... exact
    law per pde/problems SlotCyl (reference Transport/Problem/
    SlotCyl.hpp)."""
    from quinoa_tpu.pde.problems import SlotCyl

    mesh = box_tet_mesh(12, 12, 3, hi=(1.0, 1.0, 0.25))
    prob = SlotCyl()
    tr = ParticleTracker(mesh, analytic_velocity(prob))
    xp, ep = seed_particles(mesh, 100, seed=7)
    # keep particles near the center region so none exits the box
    keep = ((xp[0] - 0.5) ** 2 + (xp[1] - 0.5) ** 2) < 0.3 ** 2
    xp, ep = xp[:, keep], ep[keep]
    r0 = np.hypot(xp[0] - 0.5, xp[1] - 0.5)
    x, e = jnp.asarray(xp), jnp.asarray(ep)
    dt = 0.01
    for i in range(40):
        x, e = tr.advance(x, e, i * dt, dt)
    x = np.asarray(x)
    r1 = np.hypot(x[0] - 0.5, x[1] - 0.5)
    np.testing.assert_allclose(r1, r0, rtol=5e-3, atol=1e-4)
    # z never changes (rotation is in-plane)
    np.testing.assert_allclose(x[2], xp[2], atol=1e-12)


def test_nodal_velocity_interpolation_linear_exact():
    """Barycentric interpolation of a LINEAR nodal field is exact at
    any interior point."""
    mesh = box_tet_mesh(4, 4, 4)
    geom = make_tracker_geom(mesh)
    xp, ep = seed_particles(mesh, 50, seed=2)
    # nodal conserved state with rho=2 and momentum = linear field
    N = mesh.nnode
    c = mesh.coords.T  # (3, N)
    U = np.zeros((5, N))
    U[0] = 2.0
    U[1] = 2.0 * (3.0 * c[0] + 1.0)
    U[2] = 2.0 * (c[1] - 2.0 * c[2])
    U[3] = 2.0 * (0.5 - c[0])
    lam = barycentric(geom, jnp.asarray(xp), jnp.asarray(ep))
    v = _nodal(geom, jnp.asarray(ep), lam, jnp.asarray(U))
    np.testing.assert_allclose(v[0], 3.0 * xp[0] + 1.0, atol=1e-12)
    np.testing.assert_allclose(v[1], xp[1] - 2.0 * xp[2], atol=1e-12)
    np.testing.assert_allclose(v[2], 0.5 - xp[0], atol=1e-12)


def _nodal(geom, ep, lam, U):
    from quinoa_tpu.particles.tracker import interp_nodal

    q = interp_nodal(geom, ep, lam, U)
    return np.asarray(q[1:4] / q[0])


@pytest.mark.slow
def test_cli_particles_h5part(tmp_path, monkeypatch):
    """--particles N writes an H5Part trajectory file alongside the
    run (H5PartWriter.cpp analog)."""
    import h5py

    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_mesh

    monkeypatch.chdir(tmp_path)
    meshfile = str(tmp_path / "box.exo")
    write_mesh(meshfile, box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5)))
    deck = ("/root/reference/tests/regression/inciter/transport/SlotCyl/"
            "asynclogic/slot_cyl_diagcg.q")
    assert main(["inciter", "-c", deck, "-i", meshfile, "--diag", "d",
                 "-o", "o", "--particles", "20"]) == 0
    with h5py.File("o.h5part") as f:
        steps = [k for k in f.keys() if k.startswith("Step#")]
        assert len(steps) >= 2
        g = f[steps[-1]]
        assert g["x"].shape == (20,)
        x = np.asarray(g["x"])
        assert np.isfinite(x).all() and (x >= 0).all() and (x <= 1).all()


@pytest.mark.slow
def test_cli_particles_compflow_nodal(tmp_path, monkeypatch):
    """--particles on a CG compflow run interpolates the solution's
    momentum/density at the tracers."""
    import h5py

    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_mesh

    monkeypatch.chdir(tmp_path)
    meshfile = str(tmp_path / "box.exo")
    write_mesh(meshfile,
               box_tet_mesh(6, 6, 6, lo=(-0.5, -0.5, -0.5),
                            hi=(0.5, 0.5, 0.5)))
    (tmp_path / "vf.q").write_text("""
inciter
  nstep 5
  cfl 0.5
  ttyi 10
  scheme diagcg
  compflow
    physics euler problem vortical_flow
    alpha 0.1 beta 1.0 p0 10.0
    material gamma 1.66666666666667 end end
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 5 error l2 end
  field_output interval 5 end
end
""")
    assert main(["inciter", "-c", str(tmp_path / "vf.q"), "-i", meshfile,
                 "--diag", "d", "-o", "o", "--particles", "10"]) == 0
    with h5py.File("o.h5part") as f:
        steps = sorted(f.keys())
        x = np.asarray(f[steps[-1]]["x"])
        assert x.shape == (10,) and np.isfinite(x).all()


@pytest.mark.slow
def test_cli_particles_survive_dtref(tmp_path, monkeypatch):
    """Tracer particles stay finite and in-domain across a dtref
    remesh (the tracker re-homes on the refined mesh)."""
    import h5py

    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_mesh

    monkeypatch.chdir(tmp_path)
    meshfile = str(tmp_path / "box.exo")
    write_mesh(meshfile, box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5)))
    (tmp_path / "amr.q").write_text("""
inciter
  nstep 6
  cfl 0.8
  ttyi 10
  scheme diagcg
  transport
    physics advection problem slot_cyl ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  amr
    dtref true
    dtfreq 3
    error jump
  end
  diagnostics interval 6 error l2 end
  field_output interval 3 end
end
""")
    assert main(["inciter", "-c", str(tmp_path / "amr.q"), "-i", meshfile,
                 "--diag", "d", "-o", "o", "--particles", "15"]) == 0
    with h5py.File("o.h5part") as f:
        steps = sorted(f.keys())
        assert len(steps) >= 2
        x = np.asarray(f[steps[-1]]["x"])
        y = np.asarray(f[steps[-1]]["y"])
        assert np.isfinite(x).all() and np.isfinite(y).all()
        assert (x >= -1e-9).all() and (x <= 1 + 1e-9).all()
