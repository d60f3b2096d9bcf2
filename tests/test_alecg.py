"""ALECG: deck routing, reference-deck run, and SPMD shard equivalence.

The reference exposes alecg as a deck-selectable scheme
(src/Control/Inciter/Options/Scheme.hpp:44-48) and exercises it in the
asynclogic suite (tests/regression/inciter/transport/SlotCyl/asynclogic/
slot_cyl_alecg.q, noop-diff: the observable is that the scheme runs its
own code path sanely on any PE count).  Here: (1) the deck must route to
the real ALECG solver — not silently run DiagCG; (2) the reference deck
runs to its step count with sane transport bounds; (3) the SPMD variant
matches the single-device solver on 2/4/8 virtual shards.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.cg import CGTransport
from quinoa_tpu.pde.problems import SlotCyl
from quinoa_tpu.inciter.alecg import ALECGSolver, make_alecg
from quinoa_tpu.parallel import build_alecg_shards, SPMDALECGSolver
from quinoa_tpu.parallel.shard import gather_global_field

REF_ALECG_DECK = (
    "/root/reference/tests/regression/inciter/transport/SlotCyl/"
    "asynclogic/slot_cyl_alecg.q"
)


def test_deck_routes_to_alecg():
    """`scheme alecg` must build the ALECG solver (Scheme.hpp:44-48), not
    silently fall back to DiagCG."""
    from quinoa_tpu.control.config import load_inciter, build_inciter

    cfg = load_inciter(open(REF_ALECG_DECK).read())
    assert cfg.scheme == "alecg"
    mesh = box_tet_mesh(4, 4, 4)
    solver, diag = build_inciter(cfg, mesh)
    assert isinstance(solver, ALECGSolver)


def test_reference_alecg_deck_runs():
    """Run the reference's slot_cyl_alecg.q semantics (10 steps, dt 1e-3,
    SlotCyl transport) and require sane rotating-slot-cylinder behavior."""
    from quinoa_tpu.control.config import load_inciter, build_inciter

    cfg = load_inciter(open(REF_ALECG_DECK).read())
    assert cfg.dt == 0.001 and cfg.nstep == 10
    mesh = box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))
    solver, diag = build_inciter(cfg, mesh)
    s = solver.nsteps(solver.initial_state(), cfg.nstep)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
    assert abs(float(s.t) - 0.01) < 1e-12
    # edge-Rusanov transport keeps the profile bounded (no FCT, so allow
    # small undershoot/overshoot but not blowup)
    assert u.min() > -0.05 and u.max() < 1.05
    row = diag.compute(s)
    assert np.isfinite(row.l2sol).all()


@pytest.mark.parametrize("nshard", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow),
])
def test_spmd_alecg_matches_single(nshard):
    mesh = box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))
    bc = mesh.all_bnodes()
    system = CGTransport(SlotCyl())

    solver1 = make_alecg(system, mesh, cfl=0.5, bcnodes=bc)
    s1 = solver1.nsteps(solver1.initial_state(), 3)

    sharded = build_alecg_shards(mesh, nshard, ncomp=1, bcnodes=bc)
    dmesh = Mesh(np.array(jax.devices()[:nshard]), ("shard",))
    solverN = SPMDALECGSolver(system, sharded, dmesh, cfl=0.5)
    sN = solverN.nsteps(solverN.initial_state(), 3)

    # SPMD scalars ride the shard axis as (S,) pieces
    assert np.isclose(float(np.asarray(sN.t).ravel()[0]),
                      float(np.asarray(s1.t).ravel()[0]), rtol=1e-12)
    uN = gather_global_field(sharded.cg, sN.u)
    np.testing.assert_allclose(uN, np.asarray(s1.u), rtol=1e-9, atol=1e-11)

    # diagnostics agree with the single-device Diagnostics
    from quinoa_tpu.inciter import Diagnostics

    row = Diagnostics(system, solver1.geom).compute(s1)
    l2sol, l2err, linf = solverN.diagnostics(sN)
    np.testing.assert_allclose(l2sol, row.l2sol, rtol=1e-9)
    np.testing.assert_allclose(l2err, row.l2err, rtol=1e-7, atol=1e-12)
