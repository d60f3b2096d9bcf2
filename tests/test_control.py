"""Control-layer tests: parse REAL reference decks and run them end-to-end.

The deck schema is the contract (SURVEY.md §5.6): these tests parse `.q`
files straight out of the reference regression tree.
"""

import os

import numpy as np
import pytest

from quinoa_tpu.control import parse_deck, load_inciter, load_walker
from quinoa_tpu.control.config import build_inciter, build_walker
from quinoa_tpu.control.qparser import first
from quinoa_tpu.mesh import box_tet_mesh

REF = "/root/reference/tests/regression"


def _read(p):
    return open(p).read()


def test_parse_sod_dg_deck():
    cfg = load_inciter(_read(f"{REF}/inciter/compflow/Euler/SodShocktube/sod_shocktube_dg.q"))
    assert cfg.title == "Sod shock-tube"
    assert cfg.nstep == 100
    assert cfg.dt == 2.0e-3
    assert cfg.scheme == "dg"
    assert cfg.pde == "compflow"
    assert cfg.problem == "sod_shocktube"
    assert cfg.gamma == 1.4
    assert cfg.bc_extrapolate == [1, 3]
    assert cfg.bc_sym == [2, 4, 5, 6]
    assert cfg.diag_interval == 1


def test_parse_slotcyl_fct_deck():
    cfg = load_inciter(_read(f"{REF}/inciter/transport/SlotCyl/fct/slot_cyl.q"))
    assert cfg.pde == "transport"
    assert cfg.problem == "slot_cyl"
    assert cfg.ctau == 1.0
    assert cfg.scheme == "diagcg"
    assert cfg.dt == 0.001


def test_parse_sedov_dgp1_deck():
    cfg = load_inciter(
        _read(f"{REF}/inciter/compflow/Euler/SedovBlastwave/sedov_blastwave_dgp1.q")
    )
    assert cfg.scheme == "dgp1"
    assert cfg.limiter == "superbeep1"
    assert cfg.problem == "sedov_blastwave"


def test_dtref_default_is_reference_cap4():
    """A reference dtref deck (no `maxlevels` extension keyword) gets
    the reference's incremental compounding cycle: maxlevels defaults
    to MAX_REFINEMENT_LEVEL = 4 (refinement.hpp:28,60), routing dtref
    through the persistent-intermediates machine (amr/adapt.py) rather
    than the single-level retag-from-base extension."""
    cfg = load_inciter("""
inciter
  nstep 10 cfl 0.8 scheme diagcg
  amr dtref true dtfreq 3 error jump end
  transport physics advection problem gauss_hump ncomp 1 depvar c end
end
""")
    assert cfg.dtref
    assert cfg.amr_maxlevels == 4
    # the extension opt-out still parses
    cfg1 = load_inciter("""
inciter
  nstep 10 cfl 0.8 scheme diagcg
  amr dtref true maxlevels 1 end
  transport physics advection problem gauss_hump ncomp 1 depvar c end
end
""")
    assert cfg1.amr_maxlevels == 1


def test_run_reference_deck_end_to_end():
    """Build and run the solver directly from a reference deck (on a
    generated box mesh)."""
    cfg = load_inciter(_read(f"{REF}/inciter/transport/SlotCyl/fct/slot_cyl.q"))
    cfg.nstep = 3
    mesh = box_tet_mesh(6, 6, 2, hi=(1.0, 1.0, 0.33))
    solver, diag = build_inciter(cfg, mesh)
    s = solver.initial_state()
    for _ in range(cfg.nstep):
        s = solver.step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    assert abs(float(s.t) - 0.003) < 1e-12  # const dt from the deck


def test_parse_and_run_walker_deck():
    cfg = load_walker(_read(f"{REF}/walker/DiagOrnsteinUhlenbeck/diagou.q"))
    assert cfg.dt == 0.001
    assert cfg.npar == 1000
    assert len(cfg.sdes) == 1
    sde = cfg.sdes[0]
    assert type(sde).__name__ == "DiagOrnsteinUhlenbeck"
    assert sde.sigmasq == (0.25, 1.0)
    assert sde.mu == (0.0, 1.5)
    # moments parsed: <o1o1> etc are central (lowercase)
    assert (("o", 0), ("o", 0)) in cfg.central

    cfg.npar = 4000
    w = build_walker(cfg, seed=3)
    P, _ = w.run(100)
    assert np.isfinite(np.asarray(P)).all()


def test_parse_walker_beta_deck_spikes():
    cfg = load_walker(_read(f"{REF}/walker/Beta/beta.q"))
    sde = cfg.sdes[0]
    assert type(sde).__name__ == "Beta"
    assert len(sde.b) == 5
    w = build_walker(cfg, seed=1)
    P0 = w.initialize()
    x = np.asarray(P0[:, :5])
    # jointdelta ICs: values only at the spikes 0.01/0.99
    assert set(np.round(np.unique(x), 2).tolist()) <= {0.01, 0.99}


def test_cli_meshconv(tmp_path):
    from quinoa_tpu.cli import main

    mesh = box_tet_mesh(2, 2, 2)
    src = str(tmp_path / "in.msh")
    dst = str(tmp_path / "out.exo")
    from quinoa_tpu.io import write_gmsh, read_exodus

    write_gmsh(src, mesh)
    assert main(["meshconv", "-i", src, "-o", dst]) == 0
    m2 = read_exodus(dst)
    assert m2.nelem == mesh.nelem


def test_cli_inciter_smoke(tmp_path):
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus

    mesh = box_tet_mesh(4, 4, 2, hi=(1.0, 1.0, 0.5))
    mpath = str(tmp_path / "box.exo")
    write_exodus(mpath, mesh)
    deck = tmp_path / "run.q"
    deck.write_text(
        """
title "smoke"
inciter
  nstep 2
  dt 0.001
  ttyi 1
  transport
    depvar c
    physics advection
    problem slot_cyl
  end
  diagnostics
    interval 1
  end
end
"""
    )
    diagp = str(tmp_path / "diag")
    out = str(tmp_path / "out")
    rc = main(["inciter", "-c", str(deck), "-i", mpath, "--diag", diagp,
               "-o", out])
    assert rc == 0
    lines = open(diagp).read().splitlines()
    assert len(lines) >= 3


def test_checkpoint_restart_roundtrip(tmp_path):
    """Run, checkpoint, restart, continue: the restarted run continues
    exactly (the reference's CHECKPOINT-chained regression pattern)."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver
    from quinoa_tpu.inciter.checkpoint import save_checkpoint, load_checkpoint

    mesh = box_tet_mesh(5, 5, 2, hi=(1.0, 1.0, 0.4))
    solver = DiagCGSolver(CGTransport(SlotCyl()), make_cggeom(mesh),
                          const_dt=1e-3)
    s = solver.nsteps(solver.initial_state(), 4)
    ck = str(tmp_path / "restart")
    save_checkpoint(ck, s, {"it": int(s.it)})
    s_cont = solver.nsteps(s, 3)

    s2, meta = load_checkpoint(ck, type(s))
    assert meta["it"] == 4
    assert int(s2.it) == 4
    s2 = solver.nsteps(s2, 3)
    assert np.allclose(np.asarray(s_cont.u), np.asarray(s2.u), atol=0)
    # double-checkpoint slots alternate
    save_checkpoint(ck, s2)
    save_checkpoint(ck, s2)
    s3, meta3 = load_checkpoint(ck, type(s))
    assert int(s3.it) == 7


def test_cli_checkpoint_restart(tmp_path, monkeypatch):
    """End-to-end CLI restart: run 10 steps writing a checkpoint at step
    5, then restart from it — the continued run's diagnostics match the
    uninterrupted run exactly."""
    import numpy as np
    from quinoa_tpu.cli import main

    deck = tmp_path / "d.q"
    deck.write_text("""
    inciter
      nstep 10
      dt 1.0e-3
      scheme dg
      transport
        physics advection problem gauss_hump ncomp 1 depvar c
        bc_extrapolate sideset 1 end end
        bc_inlet sideset 2 end end
        bc_outlet sideset 3 end end
      end
      diagnostics interval 1 error l2 end
    end
    """)
    mesh = ("/root/reference/tests/regression/inciter/mesh_refinement/"
            "dtref/unitcube_01_112_ss3.exo")
    monkeypatch.chdir(tmp_path)

    def rows(path):
        return np.array([[float(x) for x in l.split()]
                         for l in open(path) if not l.startswith("#")])

    # rsfreq 7 -> exactly one checkpoint (at it=7) within 10 steps
    assert main(["inciter", "-c", str(deck), "-i", mesh,
                 "--diag", "diag_full", "-r", "7",
                 "--checkpoint-dir", "ck"]) == 0
    full = rows("diag_full")
    assert full.shape[0] == 10

    # nstep 10 caps the restarted run at it=10 (3 more steps)
    assert main(["inciter", "-c", str(deck), "-i", mesh,
                 "--diag", "diag_rest", "--restart", "ck"]) == 0
    rest = rows("diag_rest")
    assert rest.shape[0] == 3 and int(rest[0, 0]) == 8
    assert np.allclose(rest, full[7:], rtol=1e-13, atol=1e-15)


def test_keyword_help():
    """-H prints the keyword list; -H <kw> prints a keyword page; the
    registry covers every block the parser knows (HelpFactory analog,
    src/Control/HelpFactory.hpp)."""
    import contextlib
    import io

    from quinoa_tpu.cli import main
    from quinoa_tpu.control.keywords import KEYWORDS, format_keyword_help
    from quinoa_tpu.control.qparser import BLOCK_PARENTS

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["inciter", "-H"]) == 0
    out = buf.getvalue()
    assert "scheme" in out and "cfl" in out

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["-H", "scheme"]) == 0
    assert "diagcg" in buf.getvalue()

    assert "unknown" in format_keyword_help("notakeyword")

    # every parser block except SDE-internal blocks has a help entry
    missing = [b for b in BLOCK_PARENTS
               if b not in KEYWORDS and not b.startswith("ic")]
    assert not missing, missing


@pytest.mark.slow
def test_cli_preemption_drain(tmp_path):
    """SIGTERM mid-run drains gracefully: the current step finishes, a
    checkpoint is written, the process exits 0 — and --restart resumes
    from the preempted step and runs to completion (preemptible-VM
    behavior; the reference's Charm++ rsfreq restart contract)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    import numpy as np

    deck = tmp_path / "d.q"
    deck.write_text("""
    inciter
      nstep 400
      dt 1.0e-4
      scheme dg
      transport
        physics advection problem gauss_hump ncomp 1 depvar c
        bc_extrapolate sideset 1 end end
        bc_inlet sideset 2 end end
        bc_outlet sideset 3 end end
      end
      diagnostics interval 1 error l2 end
    end
    """)
    mesh = ("/root/reference/tests/regression/inciter/mesh_refinement/"
            "dtref/unitcube_01_112_ss3.exo")
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from quinoa_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    p = subprocess.Popen(
        [sys.executable, "-c", code, "inciter", "-c", str(deck),
         "-i", mesh, "--diag", "diag_pre", "--checkpoint-dir", "ck"],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    diag = tmp_path / "diag_pre"
    deadline = time.time() + 300
    while time.time() < deadline:
        if diag.exists() and sum(1 for l in open(diag)
                                 if not l.startswith("#")) >= 2:
            break
        if p.poll() is not None:
            raise AssertionError(f"run ended early:\n{p.stdout.read()}")
        time.sleep(0.02)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out
    assert "preempted at it=" in out

    def rows(path):
        return np.array([[float(x) for x in l.split()]
                         for l in open(path) if not l.startswith("#")])

    pre = rows(diag)
    k = int(pre[-1, 0])
    assert 0 < k < 400  # genuinely interrupted mid-run
    # resume in-process (conftest already forces CPU)
    from quinoa_tpu.cli import main

    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["inciter", "-c", str(deck), "-i", mesh,
                     "--diag", "diag_rest", "--restart", "ck"]) == 0
    finally:
        os.chdir(old)
    rest = rows(tmp_path / "diag_rest")
    assert int(rest[0, 0]) == k + 1 and int(rest[-1, 0]) == 400
    assert np.all(np.diff(rest[:, 0]) == 1)


@pytest.mark.slow
def test_cli_preemption_drain_spmd(tmp_path):
    """The --npes SPMD driver drains on SIGTERM the same way: sharded
    checkpoint + clean exit + --restart resume."""
    import signal
    import subprocess
    import sys
    import time

    deck = tmp_path / "d.q"
    deck.write_text("""
    inciter
      nstep 300
      dt 1.0e-4
      scheme dg
      transport
        physics advection problem gauss_hump ncomp 1 depvar c
        bc_extrapolate sideset 1 end end
        bc_inlet sideset 2 end end
        bc_outlet sideset 3 end end
      end
      diagnostics interval 1 error l2 end
    end
    """)
    mesh = ("/root/reference/tests/regression/inciter/mesh_refinement/"
            "dtref/unitcube_01_112_ss3.exo")
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; from quinoa_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    p = subprocess.Popen(
        [sys.executable, "-c", code, "inciter", "-c", str(deck),
         "-i", mesh, "--npes", "2", "--diag", "diag_pre",
         "--checkpoint-dir", "ck"],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    diag = tmp_path / "diag_pre"
    deadline = time.time() + 300
    while time.time() < deadline:
        if diag.exists() and sum(1 for l in open(diag)
                                 if not l.startswith("#")) >= 2:
            break
        if p.poll() is not None:
            raise AssertionError(f"run ended early:\n{p.stdout.read()}")
        time.sleep(0.02)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out
    assert "preempted at it=" in out
    k = int(out.split("preempted at it=")[1].split(":")[0])
    assert 0 < k < 300

    rest_code = subprocess.run(
        [sys.executable, "-c", code, "inciter", "-c", str(deck),
         "-i", mesh, "--npes", "2", "--diag", "diag_rest",
         "--restart", "ck"],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=560,
    )
    assert rest_code.returncode == 0, rest_code.stdout + rest_code.stderr
    import numpy as np
    rest = np.array([[float(x) for x in l.split()]
                     for l in open(tmp_path / "diag_rest")
                     if not l.startswith("#")])
    assert int(rest[0, 0]) == k + 1 and int(rest[-1, 0]) == 300


def test_cli_benchmark_mode(tmp_path, monkeypatch):
    """-b suppresses field output but keeps diagnostics (the reference's
    benchmark switch, MeshWriter.cpp:101)."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus

    mesh = box_tet_mesh(4, 4, 2, hi=(1.0, 1.0, 0.5))
    write_exodus(str(tmp_path / "box.exo"), mesh)
    (tmp_path / "run.q").write_text("""
    inciter
      nstep 2  dt 0.001
      transport depvar c physics advection problem slot_cyl end
      diagnostics interval 1 end
    end
    """)
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", "run.q", "-i", "box.exo",
                 "--diag", "diag", "-o", "out", "-b"]) == 0
    assert not list(tmp_path.glob("out*"))
    assert sum(1 for l in open(tmp_path / "diag")
               if not l.startswith("#")) == 2


def test_diag_format_precision(tmp_path, monkeypatch):
    """diagnostics-block format/precision keywords control the diag
    file's float formatting (TxtFloatFormat; reference decks say e.g.
    `format scientific`)."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus

    mesh = box_tet_mesh(4, 4, 2, hi=(1.0, 1.0, 0.5))
    write_exodus(str(tmp_path / "box.exo"), mesh)
    (tmp_path / "run.q").write_text("""
    inciter
      nstep 2  dt 0.001
      transport depvar c physics advection problem slot_cyl end
      diagnostics interval 1 format scientific precision 4 end
    end
    """)
    monkeypatch.chdir(tmp_path)
    assert main(["inciter", "-c", "run.q", "-i", "box.exo",
                 "--diag", "diag", "-b"]) == 0
    rows = [l.split() for l in open(tmp_path / "diag")
            if not l.startswith("#")]
    for tok in rows[0][1:]:
        mant = tok.partition("e")[0]
        assert len(mant.split(".")[1]) == 4
