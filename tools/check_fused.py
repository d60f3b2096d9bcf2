"""On-chip check: fused face kernel vs the XLA face pass, then bench."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY, dg_rhs
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.inciter.dg import DGSolver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    TF = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mesh = box_tet_mesh(n, n, n)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    from quinoa_tpu.ops.face_accum import build_accum_plan

    solver.accum_plan = build_accum_plan(geom, TF=TF, W=TF)
    plan = solver.accum_plan
    assert plan is not None, "no accum plan (not on TPU?)"
    state = solver.initial_state()
    # take a few steps so U is non-trivial
    state = solver.nsteps(state, 3)
    U = state.u

    r_fused = jax.jit(
        lambda g, p, u: dg_rhs(system, g, u, None, 0.0, accum_plan=p,
                               face_gp=False))(geom, plan, U)
    r_xla = jax.jit(
        lambda g, u: dg_rhs(system, g, u, None, 0.0, accum_plan=None,
                            face_gp=False))(geom, U)
    a, b = np.asarray(r_fused), np.asarray(r_xla)
    scale = np.abs(b).max()
    err = np.abs(a - b).max() / scale
    print(f"rhs rel err (fused vs xla): {err:.3e}  scale={scale:.3e}")
    assert err < 5e-6, err

    if n >= 32:
        s1 = solver.step(state)
        jax.block_until_ready(s1.u)
        t0 = time.perf_counter()
        reps = 10
        s = state
        for _ in range(reps):
            s = solver.step(s)
        jax.block_until_ready(s.u)
        ms = (time.perf_counter() - t0) / reps * 1e3
        ups = mesh.nelem / (ms / 1e3)
        print(f"step {ms:.1f} ms -> {ups/1e6:.3f}M updates/s")


if __name__ == "__main__":
    main()
