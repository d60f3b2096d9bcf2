"""Overdecomposition (virtualization): multiple chunks per device.

The reference's Charm++ overdecomposition lever (LoadDistributor.cpp:
23-90, inciter_performance.dox:21-62) mapped to LPT chunk->device
assignment + per-device chunk merging into super-shards that the
unchanged SPMD solvers run (multi-copy rev_slot combine).
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from quinoa_tpu.base.load import linear_load_distributor
from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.cg import CGTransport
from quinoa_tpu.pde.problems import SlotCyl
from quinoa_tpu.parallel.overdecomp import (
    build_overdecomposed_cg, lpt_assign,
)
from quinoa_tpu.parallel.spmd import SPMDDiagCGSolver
from quinoa_tpu.parallel.shard import gather_global_field


def _mesh_devices(n):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), ("shard",))


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(8, 8, 3, hi=(1.0, 1.0, 0.375))


def test_lpt_balances():
    rng = np.random.default_rng(0)
    costs = rng.integers(50, 150, size=16).astype(float)
    a = lpt_assign(costs, 4, 4)
    assert sorted(a.reshape(-1).tolist()) == list(range(16))
    loads = costs[a].sum(axis=1)
    assert loads.max() - loads.min() <= costs.max()


def test_virtualization_scales_chunks(mesh):
    """u=0 -> one chunk per device; higher u -> more, smaller chunks
    (the linearLoadDistributor law)."""
    o0 = build_overdecomposed_cg(mesh, 2, 0.0, 1)
    oh = build_overdecomposed_cg(mesh, 2, 0.9, 1)
    assert o0.cpd == 1
    assert oh.cpd > 2
    _, nchare = linear_load_distributor(0.9, mesh.nelem, 2)
    assert oh.cpd * 2 >= nchare


@pytest.mark.parametrize("virt", [
    0.5, pytest.param(0.9, marks=pytest.mark.slow)])
def test_overdecomposed_matches_single(mesh, virt):
    """2 devices x several chunks reproduces the single-device DiagCG
    run (the asynclogic-style equivalence check)."""
    from quinoa_tpu.inciter import DiagCGSolver, Diagnostics
    from quinoa_tpu.pde.cg import make_cggeom

    system = CGTransport(SlotCyl())
    bc = mesh.all_bnodes()

    ref = DiagCGSolver(system, make_cggeom(mesh), cfl=0.8, bcnodes=bc)
    sr = ref.nsteps(ref.initial_state(), 5)

    over = build_overdecomposed_cg(mesh, 2, virt, system.ncomp,
                                   bcnodes=bc)
    sol = SPMDDiagCGSolver(system, over.sharded, _mesh_devices(2),
                           cfl=0.8)
    so = sol.nsteps(sol.initial_state(), 5)

    assert np.isclose(float(np.asarray(so.t).ravel()[0]), float(np.asarray(sr.t).ravel()[0]), rtol=1e-12)
    u_ref = np.asarray(sr.u)
    u_over = gather_global_field(over.sharded, so.u)
    np.testing.assert_allclose(u_over, u_ref, rtol=0, atol=1e-9)

    dg = Diagnostics(system, ref.geom)
    row = dg.compute(sr)
    l2o, _, _ = sol.diagnostics(so)
    np.testing.assert_allclose(np.asarray(l2o), np.asarray(row.l2sol),
                               atol=1e-11)


def test_chunk_loads_balanced(mesh):
    """LPT keeps per-device real-element loads within one chunk of each
    other."""
    over = build_overdecomposed_cg(mesh, 4, 0.8, 1)
    emask = np.asarray(over.sharded.geom.emask)  # (npes, EM)
    per_dev = emask.sum(axis=1)
    nchunk = over.npes * over.cpd
    chunk_max = np.ceil(mesh.nelem / nchunk) + nchunk  # leaky-part slack
    assert per_dev.max() - per_dev.min() <= chunk_max


@pytest.mark.slow
def test_cli_virtualization(tmp_path, monkeypatch):
    """--npes 2 -u 0.8 reproduces the single-device CLI diag file."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "t.q"
    deck.write_text("""
inciter
  nstep 5
  cfl 0.8
  scheme diagcg
  transport
    physics advection problem slot_cyl ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 1 error l2 end
end
""")
    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_1k.exo")
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", str(deck), "-i", src,
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", src, "--diag", "dv",
                 "--npes", "2", "-u", "0.8"]) == 0

    def rows(p):
        return np.array([[float(x) for x in ln.split()]
                         for ln in open(p) if not ln.startswith("#")])

    np.testing.assert_allclose(rows("dv"), rows("d1"), rtol=0, atol=1e-9)


def test_dg_overdecomposed_matches_single():
    """2 devices x several DG chunks reproduces the single-device DG
    run (merged chunk blocks + interface-buffer ghosts)."""
    import jax.numpy as jnp

    from quinoa_tpu.pde.dg import build_dggeom, BC_EXTRAPOLATE, BC_SYMMETRY
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SodShocktube
    from quinoa_tpu.inciter.dg import DGSolver
    from quinoa_tpu.parallel.dg_spmd import SPMDDGSolver
    from quinoa_tpu.parallel.overdecomp import build_overdecomposed_dg

    m = box_tet_mesh(10, 3, 3, hi=(1.0, 0.3, 0.3))
    bc = {1: BC_EXTRAPOLATE, 2: BC_EXTRAPOLATE, 3: BC_SYMMETRY,
          4: BC_SYMMETRY, 5: BC_SYMMETRY, 6: BC_SYMMETRY}
    system = DGCompFlow(SodShocktube(), riemann_flux="hllc")

    geom1 = build_dggeom(m, ndof=4, bc_sidesets=bc)
    s1solver = DGSolver(system, geom1, cfl=0.5, limiter="superbeep1")
    s1 = s1solver.nsteps(s1solver.initial_state(), 3)

    # u=0.5 (cpd=2) keeps this in the fast tier; the slow CLI tests
    # and the asynclogic matrix cover u=0.8/0.9 chunk packing
    over = build_overdecomposed_dg(m, 2, 0.5, ndof=4, bc_sidesets=bc)
    assert over.cpd > 1
    sN = SPMDDGSolver(system, over.sharded, _mesh_devices(2), cfl=0.5,
                      limiter="superbeep1")
    st = sN.nsteps(sN.initial_state(), 3)

    assert np.isclose(float(np.asarray(st.t).ravel()[0]), float(np.asarray(s1.t).ravel()[0]), rtol=1e-12)
    uN = sN.gather_global(st)
    u1 = np.asarray(s1.u)
    err = np.abs(uN - u1).max()
    assert err < 1e-9, err


@pytest.mark.slow
def test_cli_dg_virtualization(tmp_path, monkeypatch):
    """'scheme dg' with --npes 2 -u 0.8 reproduces the single-device
    CLI diag file."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "t.q"
    deck.write_text("""
inciter
  nstep 5
  cfl 0.8
  scheme dg
  transport
    physics advection problem gauss_hump ncomp 1 depvar c
    bc_extrapolate sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 1 error l2 end
end
""")
    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_1k.exo")
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", str(deck), "-i", src,
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", src, "--diag", "dv",
                 "--npes", "2", "-u", "0.8"]) == 0

    def rows(p):
        return np.array([[float(x) for x in ln.split()]
                         for ln in open(p) if not ln.startswith("#")])

    np.testing.assert_allclose(rows("dv"), rows("d1"), rtol=0, atol=1e-9)


def test_alecg_overdecomposed_matches_single():
    """2 devices x several ALECG chunks reproduces the single-device
    ALECG run (CG merge + per-chunk edge tables)."""
    from quinoa_tpu.inciter.alecg import ALECGSolver, build_edge_tables
    from quinoa_tpu.pde.cg import make_cggeom
    from quinoa_tpu.parallel.alecg_spmd import SPMDALECGSolver
    from quinoa_tpu.parallel.overdecomp import build_overdecomposed_alecg

    m = box_tet_mesh(8, 8, 3, hi=(1.0, 1.0, 0.375))
    system = CGTransport(SlotCyl())
    bc = m.all_bnodes()

    ref = ALECGSolver(system, make_cggeom(m), build_edge_tables(m),
                      cfl=0.6, bcnodes=bc)
    sr = ref.nsteps(ref.initial_state(), 4)

    over = build_overdecomposed_alecg(m, 2, 0.8, ncomp=system.ncomp,
                                      bcnodes=bc)
    assert over.cpd > 1
    sol = SPMDALECGSolver(system, over.sharded, _mesh_devices(2),
                          cfl=0.6)
    so = sol.nsteps(sol.initial_state(), 4)

    assert np.isclose(float(np.asarray(so.t).ravel()[0]), float(np.asarray(sr.t).ravel()[0]), rtol=1e-12)
    u_over = gather_global_field(over.sharded.cg, so.u)
    np.testing.assert_allclose(u_over, np.asarray(sr.u), rtol=0,
                               atol=1e-9)


@pytest.mark.slow
def test_cli_alecg_virtualization(tmp_path, monkeypatch):
    """'scheme alecg' with --npes 2 -u 0.5 reproduces the single-device
    CLI diag file (completing the asynclogic scheme x virtualization
    matrix the reference sweeps)."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "t.q"
    deck.write_text("""
inciter
  nstep 5
  dt 0.001
  scheme alecg
  transport
    physics advection problem slot_cyl ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 1 error l2 end
end
""")
    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_1k.exo")
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", str(deck), "-i", src,
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", src, "--diag", "dv",
                 "--npes", "2", "-u", "0.5"]) == 0

    def rows(p):
        return np.array([[float(x) for x in ln.split()]
                         for ln in open(p) if not ln.startswith("#")])

    np.testing.assert_allclose(rows("dv"), rows("d1"), rtol=0, atol=1e-9)
