"""On-chip validation + bench of the fused multimat face pass.

Compares the fused near/far rhs (want_delt) against the unfused
accumulate-faces path on the interface-advection problem, then times
both solvers (chained states + host readback, per the axon
measurement rules).  Usage:

    PYTHONPATH=/root/repo python tools/check_multimat_fused.py [n=32]
"""

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.dirname(_os_.path.dirname(_os_.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.mesh.reorder import hilbert_element_reorder
from quinoa_tpu.pde.dg import build_dggeom, BC_EXTRAPOLATE, BC_SYMMETRY
from quinoa_tpu.pde.multimat import MultiMatSolver, MultiMatSystem
from quinoa_tpu.pde.problems.multimat import MMInterfaceAdvection


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    bc = {1: BC_EXTRAPOLATE, 2: BC_EXTRAPOLATE}
    bc.update({i: BC_SYMMETRY for i in range(3, 7)})
    geom = build_dggeom(mesh, ndof=1, bc_sidesets=bc)
    system = MultiMatSystem(MMInterfaceAdvection())
    print(f"E={geom.nelem} F={geom.nface} C={system.ncomp}")

    sol = MultiMatSolver(system, geom, cfl=0.5)
    assert sol.accum_plan is not None and sol.accum_plan.fused is not None
    assert system.fused_ok

    # correctness: fused vs unfused rhs on the initial state
    st = sol.initial_state()
    r_f, delt = jax.jit(
        lambda g, p, u: system.rhs_p0(g, u, 0.0, accum_plan=p,
                                      want_delt=True)
    )(geom, sol.accum_plan, st.u)
    system.fused_ok = False
    r_x = jax.jit(
        lambda g, p, u: system.rhs_p0(g, u, 0.0, accum_plan=p)
    )(geom, sol.accum_plan, st.u)
    system.fused_ok = True
    err = float(jnp.abs(r_f - r_x).max())
    ref = float(jnp.abs(r_x).max())
    print(f"fused-vs-unfused rhs max abs err {err:.3e} (scale {ref:.3e})")
    assert err <= 1e-5 * max(ref, 1.0), "fused multimat rhs mismatch"

    def bench(tag, solver):
        s = solver.step(solver.initial_state())
        float(jnp.sum(s.u))
        t0 = time.perf_counter()
        for _ in range(10):
            s = solver.step(s)
        float(jnp.sum(s.u))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{tag:24s} {ms:7.1f} ms  "
              f"{geom.nelem * 1e-6 / ms * 1e3:6.2f}M upd/s")

    bench("multimat fused", sol)
    system.fused_ok = False
    sol2 = MultiMatSolver(system, geom, cfl=0.5)
    system.fused_ok = False  # ctor resets it
    bench("multimat unfused", sol2)


if __name__ == "__main__":
    main()
