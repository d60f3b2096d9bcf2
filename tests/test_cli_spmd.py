"""CLI --npes: the distributed production path must reproduce the
single-device diag file.

The reference's executable is parallel by construction (Transporter
creates Partitioner/chare arrays for every run, src/Inciter/
Transporter.cpp:278-352) and its asynclogic suite re-runs the same deck
over PE counts 1..8 requiring identical physics (tests/regression/
inciter/transport/SlotCyl/asynclogic/CMakeLists.txt).  Here: run the
reference decks through `quinoa_tpu inciter` once single-device and once
with --npes 8 on the virtual device mesh and require the diag histories
to agree to 1e-9.
"""

import numpy as np
import pytest

from quinoa_tpu.cli import main
from quinoa_tpu.io import write_mesh
from quinoa_tpu.mesh import box_tet_mesh

pytestmark = pytest.mark.slow  # full-CLI parity runs

DECKS = (
    "/root/reference/tests/regression/inciter/transport/SlotCyl/asynclogic"
)


@pytest.fixture(scope="module")
def meshfile(tmp_path_factory):
    d = tmp_path_factory.mktemp("clispmd")
    p = str(d / "box.exo")
    write_mesh(p, box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5)))
    return p


def _read_diag(path):
    rows = [ln.split() for ln in open(path) if not ln.startswith("#")]
    return np.array([[float(x) for x in r] for r in rows])


@pytest.mark.parametrize("scheme", ["diagcg", "alecg", "dg"])
def test_cli_npes8_matches_single(tmp_path, meshfile, scheme):
    deck = f"{DECKS}/slot_cyl_{scheme}.q"
    d1 = str(tmp_path / "diag1")
    d8 = str(tmp_path / "diag8")
    rc = main(["inciter", "-c", deck, "-i", meshfile, "--diag", d1,
               "-o", str(tmp_path / "o1")])
    assert rc == 0
    rc = main(["inciter", "-c", deck, "-i", meshfile, "--diag", d8,
               "-o", str(tmp_path / "o8"), "--npes", "8"])
    assert rc == 0
    a, b = _read_diag(d1), _read_diag(d8)
    assert a.shape == b.shape and a.shape[0] == 10
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("scheme", ["diagcg", "dg"])
def test_per_shard_piece_writes(tmp_path, meshfile, monkeypatch, scheme):
    """--pieces == --npes writes each piece from its own device-local
    buffer (no global field gather); the joined pieces must equal the
    single-device field output."""
    from quinoa_tpu.io.pieces import join_exodus_pieces
    from quinoa_tpu.io.exodus import (
        read_exodus_fields, read_exodus_elem_fields,
    )

    deck = tmp_path / "p.q"
    deck.write_text(f"""
inciter
  nstep 4
  cfl 0.8
  scheme {scheme}
  field_output interval 4 end
  transport
    physics advection problem slot_cyl ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 4 error l2 end
end
""")
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "d1", "-o", "s1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "d4", "-o", "s4", "--npes", "4",
                 "--pieces", "4"]) == 0
    import glob

    paths = sorted(glob.glob("s4.e-s.4.4.*"))
    assert len(paths) == 4
    jm, jn, je, jt = join_exodus_pieces(paths)
    if scheme == "diagcg":
        names, _, vals = read_exodus_fields("s1.e-s.4.exo")
        ref = dict(zip(names, vals[-1]))
        for k, v in jn.items():
            np.testing.assert_allclose(v, ref[k], atol=1e-9)
        assert jn
    else:
        names, _, vals = read_exodus_elem_fields("s1.e-s.4.exo")
        ref = dict(zip(names, vals[-1]))
        for k, v in je.items():
            np.testing.assert_allclose(v, ref[k], atol=1e-9)
        assert je


def test_cli_multimat_npes_matches_single(tmp_path, monkeypatch):
    """The reference multimat Sod deck runs under --npes 4 and
    reproduces the single-device diag file (SPMDMultiMatSolver)."""
    base = ("/root/reference/tests/regression/inciter/multimat/"
            "SodShocktube/")
    monkeypatch.chdir(tmp_path)
    import re

    deck = open(base + "sod_shocktube_dg.q").read()
    deck = re.sub(r"nstep\s+\d+", "nstep 6", deck)
    (tmp_path / "mm.q").write_text(deck)
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "d1"]) == 0
    assert main(["inciter", "-c", str(tmp_path / "mm.q"),
                 "-i", base + "rectangle_01_1.5k.exo",
                 "--diag", "d4", "--npes", "4"]) == 0
    np.testing.assert_allclose(_read_diag("d4"), _read_diag("d1"),
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("scheme", ["diagcg", "dg"])
def test_per_chare_piece_writes_overdecomposed(tmp_path, meshfile,
                                               monkeypatch, scheme):
    """Under -u, --pieces == cpd*npes writes one file per CHARE from
    the owning device's buffer (MeshWriter.hpp:33-100: a file per chare
    regardless of placement); the joined pieces must equal the
    single-device field output."""
    import math

    from quinoa_tpu.base.load import linear_load_distributor
    from quinoa_tpu.io.pieces import join_exodus_pieces
    from quinoa_tpu.io.exodus import (
        read_exodus_fields, read_exodus_elem_fields,
    )
    from quinoa_tpu.io.exodus import read_exodus

    deck = tmp_path / "p.q"
    deck.write_text(f"""
inciter
  nstep 4
  cfl 0.8
  scheme {scheme}
  field_output interval 4 end
  transport
    physics advection problem slot_cyl ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 4 error l2 end
end
""")
    monkeypatch.chdir(tmp_path)
    nelem = read_exodus(meshfile).nelem
    _, nchare = linear_load_distributor(0.5, nelem, 4)
    nchunk = max(math.ceil(nchare / 4), 1) * 4
    assert nchunk > 4  # the overdecomposed regime, one file per chare
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "d1", "-o", "s1"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", meshfile,
                 "--diag", "dc", "-o", "sc", "--npes", "4",
                 "-u", "0.5", "--pieces", str(nchunk)]) == 0
    import glob

    paths = sorted(glob.glob(f"sc.e-s.4.{nchunk}.*"))
    assert len(paths) == nchunk
    jm, jn, je, jt = join_exodus_pieces(paths)
    if scheme == "diagcg":
        names, _, vals = read_exodus_fields("s1.e-s.4.exo")
        ref = dict(zip(names, vals[-1]))
        for k, v in jn.items():
            np.testing.assert_allclose(v, ref[k], atol=1e-9)
        assert jn
    else:
        names, _, vals = read_exodus_elem_fields("s1.e-s.4.exo")
        ref = dict(zip(names, vals[-1]))
        for k, v in je.items():
            np.testing.assert_allclose(v, ref[k], atol=1e-9)
        assert je


@pytest.mark.slow
def test_cli_lbfreq_pdg(tmp_path, monkeypatch, capsys):
    """--lbfreq N under p-adaptive DG: the run repartitions by active
    dofs (weighted SFC, the Charm++ LB / Zoltan weighted-HSFC analog)
    and continues with migrated state — diagnostics match the
    un-balanced run to trajectory tolerance."""
    import re

    import numpy as np

    from quinoa_tpu.cli import main

    base = ("/root/reference/tests/regression/inciter/compflow/Euler/"
            "SedovBlastwave/")
    deck_txt = open(base + "sedov_blastwave_pdg.q").read()
    deck_txt = re.sub(r"nstep \d+", "nstep 6", deck_txt)
    deck = tmp_path / "pdg.q"
    deck.write_text(deck_txt)
    mesh = base + "unitsquare_01_3.6k.exo"
    monkeypatch.chdir(tmp_path)

    assert main(["inciter", "-c", str(deck), "-i", mesh, "--npes", "2",
                 "--diag", "diag_ref", "-b"]) == 0
    assert main(["inciter", "-c", str(deck), "-i", mesh, "--npes", "2",
                 "--diag", "diag_lb", "--lbfreq", "2", "-v", "-b"]) == 0
    out = capsys.readouterr().out
    assert "lb @it=" in out  # the balancer actually fired

    def rows(p):
        return np.array([[float(x) for x in l.split()]
                         for l in open(p) if not l.startswith("#")])

    ref, lb = rows("diag_ref"), rows("diag_lb")
    assert ref.shape == lb.shape
    # migration carries u/ndofel exactly; remaining drift is the
    # per-partition kernel tiling ulps amplified over 6 steps
    np.testing.assert_allclose(lb, ref, rtol=1e-5, atol=1e-9)


@pytest.mark.slow
def test_cli_lbfreq_pdg_overdecomposed(tmp_path, monkeypatch, capsys):
    """--lbfreq under -u: chunks keep their membership and re-LPT-pack
    to devices by active-dof cost (chare migration); diagnostics match
    the unbalanced overdecomposed run."""
    import re

    import numpy as np

    from quinoa_tpu.cli import main

    base = ("/root/reference/tests/regression/inciter/compflow/Euler/"
            "SedovBlastwave/")
    deck_txt = open(base + "sedov_blastwave_pdg.q").read()
    deck_txt = re.sub(r"nstep \d+", "nstep 6", deck_txt)
    deck = tmp_path / "pdg.q"
    deck.write_text(deck_txt)
    mesh = base + "unitsquare_01_3.6k.exo"
    monkeypatch.chdir(tmp_path)

    common = ["inciter", "-c", str(deck), "-i", mesh, "--npes", "2",
              "-u", "0.5", "-b"]
    assert main(common + ["--diag", "diag_ref"]) == 0
    assert main(common + ["--diag", "diag_lb", "--lbfreq", "2",
                          "-v"]) == 0
    out = capsys.readouterr().out
    assert "lb @it=" in out

    def rows(p):
        return np.array([[float(x) for x in l.split()]
                         for l in open(p) if not l.startswith("#")])

    ref, lb = rows("diag_ref"), rows("diag_lb")
    assert ref.shape == lb.shape
    np.testing.assert_allclose(lb, ref, rtol=1e-5, atol=1e-9)
