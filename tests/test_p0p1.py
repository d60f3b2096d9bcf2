"""P0P1 (rDG) scheme semantics.

The reference's P0P1 evolves ndof=1 (cell averages) while face states
and limiters use rdof=4 dofs (Grammar.hpp:368-385: 'P0P1 has ndof=1 and
rdof=4'; DG.cpp:1479-1488 updates k < ndof only, so the higher dofs keep
their initial-projection/limited values); the CFL scale uses the evolved
order p=0 (DG.cpp:1404-1418).
"""

import numpy as np
import pytest

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.control.config import load_inciter, build_inciter

DECK = """
inciter
  nstep 8
  cfl 0.8
  scheme p0p1
  transport
    physics advection problem gauss_hump ncomp 1 depvar c
    bc_dirichlet sideset 1 2 3 4 5 6 end end
  end
  diagnostics interval 1 error l2 end
end
"""


def _build(scheme):
    cfg = load_inciter(DECK.replace("p0p1", scheme))
    mesh = box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))
    return cfg, build_inciter(cfg, mesh)


def test_p0p1_routing_and_frozen_slopes():
    cfg, (solver, diag) = _build("p0p1")
    assert solver.geom.ndof == 4 and solver.evolve_ndof == 1
    # CFL scale is the EVOLVED order's (p=0 -> 1.0, not DGP1's 1/3)
    assert solver.cflscale == 1.0

    s0 = solver.initial_state()
    s = solver.nsteps(s0, 5)
    u0 = np.asarray(s0.u).reshape(1, 4, -1)
    u = np.asarray(s.u).reshape(1, 4, -1)
    # cell averages evolved...
    assert np.abs(u[:, 0] - u0[:, 0]).max() > 1e-6
    # ...but without a limiter the P1 dofs stay at the initial projection
    np.testing.assert_array_equal(u[:, 1:], u0[:, 1:])
    assert float(s.t) > 0


def test_p0p1_faces_use_reconstructed_state():
    """P0P1 is not plain P0: the face fluxes see the P1 dofs, so the
    evolved cell averages differ from a pure-P0 run, and not the
    DGP1 averages either (only k=0 advances)."""
    _, (s_p0p1, d_p0p1) = _build("p0p1")
    _, (s_p0, _) = _build("dg")
    _, (s_p1, _) = _build("dgp1")
    a = s_p0p1.nsteps(s_p0p1.initial_state(), 5)
    b = s_p0.nsteps(s_p0.initial_state(), 5)
    c = s_p1.nsteps(s_p1.initial_state(), 5)
    avg_a = np.asarray(a.u).reshape(1, 4, -1)[:, 0]
    avg_b = np.asarray(b.u).reshape(1, 1, -1)[:, 0]
    avg_c = np.asarray(c.u).reshape(1, 4, -1)[:, 0]
    assert np.abs(avg_a - avg_b).max() > 1e-6
    assert np.abs(avg_a - avg_c).max() > 1e-6
    # stable and finite
    assert np.isfinite(avg_a).all()
    _, l2err, _ = d_p0p1.compute(a)
    assert np.isfinite(l2err).all()


@pytest.mark.slow
def test_p0p1_with_limiter_still_freezes_evolution():
    """With superbeep1 the P1 dofs change only through the limiter
    (DG.cpp:1251-1260 lims before each stage), never through the
    update loop."""
    cfg = load_inciter(DECK.replace(
        "scheme p0p1", "scheme p0p1 limiter superbeep1"))
    mesh = box_tet_mesh(6, 6, 4, hi=(1.0, 1.0, 0.5))
    solver, _ = build_inciter(cfg, mesh)
    assert solver.evolve_ndof == 1
    s = solver.nsteps(solver.initial_state(), 5)
    u = np.asarray(s.u)
    assert np.isfinite(u).all()
