"""Incremental multi-level dtref (amr/adapt.py): the reference's
mesh_adapter compounding cycle (refinement.hpp MAX_REFINEMENT_LEVEL=4)."""

import numpy as np
import pytest

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.amr.adapt import dtref_adapt, AdaptChain


def _hump(mesh, x0):
    x = mesh.coords
    r2 = ((x[:, 0] - x0) ** 2 + (x[:, 1] - 0.5) ** 2) / 0.05 ** 2
    return np.exp(-r2)[None, :]


def test_multilevel_refine_and_coarsen():
    mesh = box_tet_mesh(8, 8, 2, hi=(1.0, 1.0, 0.25))
    u = _hump(mesh, 0.3)
    chain = None

    # cycle 1: level-1 refinement around the hump
    ch, mesh, chain, u = dtref_adapt(mesh, chain, u, u, True, 1, None,
                                     tol_refine=0.1, tol_derefine=0.02,
                                     maxlevels=3)
    assert ch and len(chain.levels) == 1
    n1 = mesh.nelem
    assert chain.elevel.max() == 1

    # cycle 2: error field re-evaluated on the refined mesh -> level 2
    u = _hump(mesh, 0.3)
    ch, mesh, chain, u = dtref_adapt(mesh, chain, u, u, True, 1, None,
                                     tol_refine=0.1, tol_derefine=0.02,
                                     maxlevels=3)
    assert ch and len(chain.levels) == 2
    assert chain.elevel.max() == 2
    assert mesh.nelem > n1
    assert u.shape[1] == mesh.nnode
    assert np.isfinite(u).all()

    # hump gone: coarsening kicks in (one level per cycle)
    for _ in range(6):
        u = np.zeros((1, mesh.nnode))
        ch, mesh, chain, u = dtref_adapt(mesh, chain, u, u, True, 1,
                                         None, tol_refine=0.1,
                                         tol_derefine=0.02, maxlevels=3)
        if not chain.levels:
            break
    assert not chain.levels, "mesh did not coarsen back"
    assert mesh.nelem == 8 * 8 * 2 * 6


def test_maxlevels_cap():
    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.25))
    chain = None
    for _ in range(4):
        u = _hump(mesh, 0.3)
        _, mesh, chain, u = dtref_adapt(mesh, chain, u, u, True, 1,
                                        None, tol_refine=0.05,
                                        tol_derefine=0.0, maxlevels=2)
    assert chain.elevel.max() <= 2


def test_maxlevels_cap_under_closure():
    """The compatibility closure must not push refinement onto at-cap
    elements: a sharp moving front keeps tagging edges that border the
    already-refined (at-cap) region, so compatible_tags repeatedly tries
    to upgrade at-cap neighbors to 1:8 (the round-2 advisor's case; the
    reference hard-caps inside its compatibility loop,
    refinement.hpp:28)."""
    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.25))
    chain = None
    for i in range(6):
        # front sweeps across the refined region's boundary each cycle
        u = _hump(mesh, 0.25 + 0.08 * i)
        _, mesh, chain, u = dtref_adapt(mesh, chain, u, u, True, 1,
                                        None, tol_refine=0.02,
                                        tol_derefine=0.0, maxlevels=1)
        assert chain.elevel.max() <= 1, f"cap exceeded at cycle {i}"


@pytest.mark.slow
def test_cli_multilevel_dtref(tmp_path, monkeypatch):
    """maxlevels 2 deck runs end-to-end through the CLI and stays
    finite; the mesh compounds beyond one level."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "ml.q"
    deck.write_text("""
inciter
  nstep 9
  cfl 0.8
  scheme diagcg
  amr
    dtref true
    dtfreq 3
    error jump
    tol_refine 0.08
    tol_derefine 0.01
    maxlevels 2
  end
  transport
    physics advection problem gauss_hump ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 3 error l2 end
end
""")
    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_01_112_ss3.exo")
    monkeypatch.chdir(tmp_path)
    rc = main(["inciter", "-c", str(deck), "-i", src, "--diag", "d", "-v"])
    assert rc == 0
    rows = [ln.split() for ln in open("d") if not ln.startswith("#")]
    vals = np.array([[float(x) for x in r] for r in rows])
    assert np.isfinite(vals).all()


@pytest.mark.slow
def test_cli_multilevel_dtref_spmd(tmp_path, monkeypatch):
    """maxlevels 2 under --npes 4: every remesh is a resharding event;
    the sharded run reproduces the single-device multi-level diag."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "ml.q"
    deck.write_text("""
inciter
  nstep 9
  cfl 0.8
  scheme diagcg
  amr
    dtref true
    dtfreq 3
    error jump
    tol_refine 0.08
    tol_derefine 0.01
    maxlevels 2
  end
  transport
    physics advection problem gauss_hump ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 3 error l2 end
end
""")
    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_01_112_ss3.exo")
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", str(deck), "-i", src,
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", src, "--diag", "d4",
                 "--npes", "4"]) == 0
    rows = lambda p: np.array([[float(x) for x in ln.split()]
                               for ln in open(p)
                               if not ln.startswith("#")])
    np.testing.assert_allclose(rows("d4"), rows("d1"), rtol=0, atol=1e-9)
