"""Asynclogic matrix: scheme x npes x virtualization CLI equivalence.

The reference sweeps its SlotCyl decks over PE counts 1..8 and
virtualization {0, 0.5, 0.9} per scheme, requiring identical physics
(tests/regression/inciter/transport/SlotCyl/asynclogic/CMakeLists.txt:
4-63).  Here: each (scheme, npes, u) combination runs the reference
deck through the CLI on the virtual device mesh and must reproduce the
single-device diag history to 1e-9 — the race-detection analog for the
shard_map + overdecomposition machinery (chunk packing, merged
super-shards, halo combiners) across placements.

npes=1 with u>0 exercises single-device overdecomposition (the
reference's 1-PE virtualization rows).
"""

import numpy as np
import pytest

from quinoa_tpu.cli import main
from quinoa_tpu.io import write_mesh
from quinoa_tpu.mesh import box_tet_mesh

pytestmark = pytest.mark.slow

DECKS = (
    "/root/reference/tests/regression/inciter/transport/SlotCyl/asynclogic"
)

SCHEMES = ["diagcg", "alecg", "dg"]


@pytest.fixture(scope="module")
def meshfile(tmp_path_factory):
    d = tmp_path_factory.mktemp("asynclogic")
    p = str(d / "box.exo")
    write_mesh(p, box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5)))
    return p


def _read_diag(path):
    rows = [ln.split() for ln in open(path) if not ln.startswith("#")]
    return np.array([[float(x) for x in r] for r in rows])


@pytest.fixture(scope="module")
def single_diags(tmp_path_factory, meshfile):
    """Single-device reference diag per scheme, computed once."""
    d = tmp_path_factory.mktemp("single")
    out = {}
    for scheme in SCHEMES:
        diag = str(d / f"diag_{scheme}")
        rc = main(["inciter", "-c", f"{DECKS}/slot_cyl_{scheme}.q",
                   "-i", meshfile, "--diag", diag,
                   "-o", str(d / f"o_{scheme}")])
        assert rc == 0
        out[scheme] = _read_diag(diag)
    return out


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("npes,virt", [
    (1, 0.5), (1, 0.9),
    (2, 0.0), (2, 0.5), (2, 0.9),
    (4, 0.0), (4, 0.5), (4, 0.9),
    (8, 0.0), (8, 0.5), (8, 0.9),
])
def test_asynclogic_matrix(tmp_path, meshfile, single_diags, scheme,
                           npes, virt):
    diag = str(tmp_path / "diag")
    cmd = ["inciter", "-c", f"{DECKS}/slot_cyl_{scheme}.q",
           "-i", meshfile, "--diag", diag, "-o", str(tmp_path / "o"),
           "--npes", str(npes)]
    if virt > 0:
        cmd += ["-u", str(virt)]
    assert main(cmd) == 0
    a, b = single_diags[scheme], _read_diag(diag)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12)


def test_multimat_virtualization(tmp_path, monkeypatch):
    """Multimat Sod under --npes 2 -u 0.5 reproduces the single-device
    diag (completing the scheme coverage of the matrix)."""
    import re

    base = ("/root/reference/tests/regression/inciter/multimat/"
            "SodShocktube/")
    monkeypatch.chdir(tmp_path)
    deck = open(base + "sod_shocktube_dg.q").read()
    deck = re.sub(r"nstep\s+\d+", "nstep 6", deck)
    (tmp_path / "mm.q").write_text(deck)
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "du", "--npes", "2", "-u", "0.5"]) == 0
    np.testing.assert_allclose(_read_diag("du"), _read_diag("d1"),
                               rtol=0, atol=1e-9)


def test_multimat_dgp1_virtualization(tmp_path, monkeypatch):
    """Multimat DG(P1) (scheme dgp1: consistent limiting + alpha
    closure in the shard_map body) under --npes 2 -u 0.5 reproduces the
    single-device dgp1 diag."""
    import re

    base = ("/root/reference/tests/regression/inciter/multimat/"
            "SodShocktube/")
    monkeypatch.chdir(tmp_path)
    deck = open(base + "sod_shocktube_dg.q").read()
    deck = re.sub(r"nstep\s+\d+", "nstep 6", deck)
    deck = deck.replace("scheme dg", "scheme dgp1")
    (tmp_path / "mm.q").write_text(deck)
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "du", "--npes", "2", "-u", "0.5"]) == 0
    np.testing.assert_allclose(_read_diag("du"), _read_diag("d1"),
                               rtol=0, atol=1e-9)


def test_dtref_under_virtualization(tmp_path, meshfile, monkeypatch):
    """During-timestep AMR under overdecomposition: each remesh is a
    resharding event that must land on the single-device trajectory
    (Refiner.cpp:417-431 under virtualization)."""
    monkeypatch.chdir(tmp_path)
    deck = tmp_path / "amr.q"
    deck.write_text("""
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
  diagnostics interval 1 error l2 end
end
""")
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "du", "--npes", "2", "-u", "0.5"]) == 0
    np.testing.assert_allclose(_read_diag("du"), _read_diag("d1"),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("npes,virt", [(2, 0.0), (4, 0.5), (8, 0.0)])
def test_asynclogic_pdg(tmp_path, npes, virt):
    """p-adaptive DG under --npes/-u: the sticky+propagated ndof
    decisions cross shard boundaries via the ndof exchanges (the comsol
    piggyback analog), so the CLI must reproduce the single-device diag
    history; f32 CLI precision bounds the comparison."""
    base = ("/root/reference/tests/regression/inciter/transport/"
            "GaussHump/")
    single = str(tmp_path / "diag1")
    rc = main(["inciter", "-c", base + "gauss_hump_pdg.q",
               "-i", base + "unitsquare_01_3.6k.exo",
               "--diag", single, "-o", str(tmp_path / "o1")])
    assert rc == 0
    diag = str(tmp_path / "diagN")
    cmd = ["inciter", "-c", base + "gauss_hump_pdg.q",
           "-i", base + "unitsquare_01_3.6k.exo",
           "--diag", diag, "-o", str(tmp_path / "oN"),
           "--npes", str(npes)]
    if virt > 0:
        cmd += ["-u", str(virt)]
    assert main(cmd) == 0
    a, b = _read_diag(single), _read_diag(diag)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=3e-6, atol=5e-8)
