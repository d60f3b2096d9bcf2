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
    # Refiner::coordRefine (Refiner.cpp:1095): an edge is tagged unless
    # BOTH endpoints are strictly outside, so every tagged edge must
    # have at least one endpoint at or below the bound...
    assert (mesh.coords[tags, 0].min(axis=1) <= 0.5).all()
    # ...and edges fully outside stay untagged
    from quinoa_tpu.mesh.derived import gen_inpoed

    untagged_possible = (mesh.coords[gen_inpoed(mesh.inpoel), 0] > 0.5)
    assert untagged_possible.all(axis=1).sum() + len(tags) \
        == len(gen_inpoed(mesh.inpoel))
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


def test_derefine_full_roundtrip():
    """Uniform 1:8 refine then coarsen everything -> the original mesh
    (element count, node count, volume, and boundary side sets)."""
    from quinoa_tpu.amr import derefine_mesh

    mesh = box_tet_mesh(3, 3, 3)
    fine, rmap = uniform_refine(mesh)
    assert fine.nelem == mesh.nelem * 8

    new, nmap, collapsed = derefine_mesh(mesh, rmap,
                                         np.ones(mesh.nelem, bool))
    assert collapsed.all()
    assert new.nelem == mesh.nelem and new.nnode == mesh.nnode
    assert np.array_equal(new.inpoel, mesh.inpoel)
    assert set(new.bface) == set(mesh.bface)
    for ss in mesh.bface:
        assert len(new.bface[ss]) == len(mesh.bface[ss])
    assert len(nmap.mid_edges) == 0


def test_derefine_conformity_locks():
    """Request coarsening for only half the parents: the fixed point may
    veto locked parents but the result must stay a conforming positive
    mesh with conserved volume."""
    from quinoa_tpu.amr import derefine_mesh

    mesh = box_tet_mesh(4, 4, 4)
    fine, rmap = uniform_refine(mesh)
    cen = mesh.coords[mesh.inpoel].mean(axis=1)
    req = cen[:, 0] < 0.5  # coarsen the left half-domain

    new, nmap, collapsed = derefine_mesh(mesh, rmap, req)
    assert collapsed.any() and not collapsed.all()
    assert (~collapsed[~req]).all()  # never coarsen unasked
    assert new.positive_jacobians()
    J, _ = tet_geometry(mesh.coords, mesh.inpoel)
    Jn, _ = tet_geometry(new.coords, new.inpoel)
    assert np.isclose(Jn.sum(), J.sum())
    # conforming: esuel face matching must succeed (raises on hanging)
    gen_esuel(new.inpoel, new.nnode)
    # coarsened parents lost children; parents that didn't ask keep all 8;
    # requesting parents at the interface become 1:2/1:4 transitions
    cnt = np.bincount(nmap.parent, minlength=mesh.nelem)
    assert (cnt[collapsed] < 8).all()
    assert (cnt[~req] == 8).all()
    assert (cnt == 1).sum() > 0  # interior of the region fully coarsens
    assert np.isin(cnt, [1, 2, 4, 8]).all()


def test_derefine_transfer_conservation():
    """DG transfer back to collapsed parents is exactly conservative;
    CG transfer preserves surviving node values."""
    from quinoa_tpu.amr import (derefine_mesh, transfer_cg_derefine,
                                transfer_dg_derefine)
    from quinoa_tpu.amr.refine import transfer_cg, transfer_dg

    mesh = box_tet_mesh(3, 3, 3)
    fine, rmap = uniform_refine(mesh)
    Jf, _ = tet_geometry(fine.coords, fine.inpoel)
    volf = np.asarray(Jf) / 6.0

    rng = np.random.default_rng(3)
    uf = rng.normal(size=(2, fine.nelem))  # DG(P0), 2 comps

    cen = mesh.coords[mesh.inpoel].mean(axis=1)
    req = cen[:, 0] < 0.5
    new, nmap, collapsed = derefine_mesh(mesh, rmap, req)
    un = transfer_dg_derefine(mesh, rmap, nmap, uf, volf, ncomp=2, ndof=1)
    Jn, _ = tet_geometry(new.coords, new.inpoel)
    voln = np.asarray(Jn) / 6.0
    for c in range(2):
        assert np.isclose((uf[c] * volf).sum(), (un[c] * voln).sum())

    # CG: refine a linear nodal field, coarsen, values must be the exact
    # restriction (midpoint values were the linear interpolant)
    ucg = mesh.coords.T[0:1] + 2.0 * mesh.coords.T[1:2]
    ufine = transfer_cg(rmap, ucg)
    ucoarse = transfer_cg_derefine(rmap, nmap, ufine)
    assert ucoarse.shape[1] == new.nnode
    assert np.allclose(ucoarse[:, : mesh.nnode], ucg)


def test_derefine_noop_when_vetoed():
    """No refined parents requested -> explicit no-change signal."""
    from quinoa_tpu.amr import derefine_mesh

    mesh = box_tet_mesh(2, 2, 2)
    fine, rmap = uniform_refine(mesh)
    new, nmap, collapsed = derefine_mesh(mesh, rmap,
                                         np.zeros(mesh.nelem, bool))
    assert new is None and not collapsed.any()
    assert nmap is rmap


def test_t0ref_uniform_derefine_roundtrip():
    """`initial uniform` + `initial uniform_derefine` in a deck restores
    the input mesh (the reference's Refiner applies t0ref ops in order)."""
    from quinoa_tpu.control.config import load_inciter, apply_t0ref

    deck = """
    inciter
      scheme dg
      transport physics advection problem gauss_hump ncomp 1 end
      amr
        t0ref true
        initial uniform
        initial uniform
        initial uniform_derefine
      end
    end
    """
    cfg = load_inciter(deck)
    assert cfg.amr_initial == ["uniform", "uniform", "uniform_derefine"]
    mesh = box_tet_mesh(2, 2, 2)
    out = apply_t0ref(cfg, mesh)
    # two uniforms then one derefine -> net one uniform level
    assert out.nelem == mesh.nelem * 8


@pytest.mark.slow
def test_cli_adaptive_dtref_cycle(tmp_path, monkeypatch, capsys):
    """Error-driven dtref through the CLI under the DEFAULT semantics —
    the reference's incremental compounding cycle (maxlevels=4,
    refinement.hpp:28; Refiner.cpp:241-260): each event refines from
    the CURRENT mesh where the jump indicator fires, so successive
    events compound depth around the advected feature.  CFL-based dt
    (like the reference's dtref regression decks) keeps the run stable
    as elements shrink up to 16x."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus

    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.25))
    mfile = str(tmp_path / "box.exo")
    write_exodus(mfile, mesh)
    deck = tmp_path / "d.q"
    deck.write_text("""
    inciter
      nstep 12
      cfl 0.8
      scheme diagcg
      transport
        physics advection problem slot_cyl ncomp 1 depvar c
        bc_dirichlet sideset 1 2 3 4 5 6 end end
      end
      amr
        dtref true
        dtfreq 4
        refvar c end
        error jump
        tol_refine 0.2
      end
      diagnostics interval 4 error l2 end
    end
    """)
    monkeypatch.chdir(tmp_path)
    rc = main(["inciter", "-c", str(deck), "-i", mfile, "-v"])
    assert rc == 0
    out = capsys.readouterr().out
    remesh = [l for l in out.splitlines() if "dtref @it=" in l]
    assert len(remesh) >= 2, remesh  # adapted more than once
    sizes = [int(l.split("-> ")[1].split()[0]) for l in remesh]
    assert all(s > mesh.nelem for s in sizes)  # refined around the feature
    assert sizes[1] > sizes[0]  # second event compounds from the first
    import numpy as np

    rows = np.array([[float(x) for x in l.split()]
                     for l in open(tmp_path / "diag") if not l.startswith("#")])
    assert np.isfinite(rows).all()
    # FCT bounds survive the adapt/transfer cycles
    assert rows[:, 3].max() < 1.0


@pytest.mark.slow
def test_cli_dtref_retag_optout(tmp_path, monkeypatch, capsys):
    """`maxlevels 1` opts out to the single-level retag-from-base
    extension (cli._dtref_remesh): every event rebuilds one refinement
    of the BASE mesh, so depth never compounds and a fixed dt sized for
    one level stays CFL-stable for the whole run."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus

    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.25))
    mfile = str(tmp_path / "box.exo")
    write_exodus(mfile, mesh)
    deck = tmp_path / "d.q"
    deck.write_text("""
    inciter
      nstep 24
      dt 5.0e-2
      scheme diagcg
      transport
        physics advection problem slot_cyl ncomp 1 depvar c
        bc_dirichlet sideset 1 2 3 4 5 6 end end
      end
      amr
        dtref true
        dtfreq 4
        refvar c end
        error jump
        tol_refine 0.2
        maxlevels 1
      end
      diagnostics interval 4 error l2 end
    end
    """)
    monkeypatch.chdir(tmp_path)
    rc = main(["inciter", "-c", str(deck), "-i", mfile, "-v"])
    assert rc == 0
    out = capsys.readouterr().out
    remesh = [l for l in out.splitlines() if "dtref @it=" in l]
    assert len(remesh) >= 2, remesh  # adapted more than once
    sizes = [int(l.split("-> ")[1].split()[0]) for l in remesh]
    assert all(s > mesh.nelem for s in sizes)  # refined around the feature
    # single-level: never more than one full uniform level of the base
    assert all(s <= mesh.nelem * 8 for s in sizes)
    import numpy as np

    rows = np.array([[float(x) for x in l.split()]
                     for l in open(tmp_path / "diag") if not l.startswith("#")])
    assert np.isfinite(rows).all()
    # FCT bounds survive the adapt/transfer cycles
    assert rows[:, 3].max() < 1.0


def test_t0ref_edgelist(tmp_path, monkeypatch):
    """`initial edgelist` refines exactly the listed node-pair edges
    (AMRInitial edgelist; Refiner::edgelistRefine, Refiner.cpp:1002)."""
    from quinoa_tpu.control.config import load_inciter, apply_t0ref
    from quinoa_tpu.mesh import box_tet_mesh

    cfg = load_inciter("""
    inciter
      nstep 1
      scheme diagcg
      transport  problem slot_cyl  ncomp 1  end
      amr
        t0ref true
        initial edgelist
        edgelist  0 1  1 2  end
      end
    end
    """)
    assert cfg.amr_edgelist == (0, 1, 1, 2)
    mesh = box_tet_mesh(3, 3, 3, hi=(1.0, 1.0, 1.0))
    n0 = mesh.nelem
    out = apply_t0ref(cfg, mesh)
    assert out.nelem > n0

    # odd-length lists are the reference's Grammar.hpp:483 error
    import pytest

    with pytest.raises(ValueError, match="even number"):
        load_inciter("""
        inciter
          scheme diagcg
          transport  problem slot_cyl  ncomp 1  end
          amr  t0ref true  initial edgelist  edgelist 0 1 2 end  end
        end
        """)


def test_child_orientation_parity():
    """The template orientation constants (_FLIP_12/_FLIP_14): refined
    children match the geometric per-child Jacobian orientation exactly,
    on jittered meshes and with an inverted-parent mesh (the parity is
    XOR'd with the parent's sign)."""
    from quinoa_tpu.amr.refine import _orient, refine_mesh
    from quinoa_tpu.amr import tag_edges_by_error
    from quinoa_tpu.mesh.unsmesh import UnsMesh

    rng = np.random.default_rng(7)
    mesh = box_tet_mesh(5, 4, 4)
    mesh.coords = mesh.coords + rng.normal(0, 0.015, mesh.coords.shape)
    tags = tag_edges_by_error(
        mesh, rng.random((1, mesh.nnode)), method="jump", tol=0.5)
    fine, _ = refine_mesh(mesh, tags)
    geo = _orient(fine.inpoel.astype(np.int64), fine.coords)
    assert np.array_equal(geo, fine.inpoel.astype(np.int64))

    # inverted parents: swap two nodes of every tet -> all-negative J
    inv = UnsMesh(coords=mesh.coords,
                  inpoel=mesh.inpoel[:, [0, 1, 3, 2]].copy())
    inv.bface = {}
    inv.bnode = {}
    fine2, _ = refine_mesh(inv, tags)
    geo2 = _orient(fine2.inpoel.astype(np.int64), fine2.coords)
    assert np.array_equal(geo2, fine2.inpoel.astype(np.int64))
