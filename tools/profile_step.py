"""Per-piece timing of the DG step at bench scale (isolated ops are
indicative only; the fused step is what counts)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY, dg_rhs, dg_dt
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.inciter.dg import DGSolver
    from quinoa_tpu.ops.face_accum import build_accum_plan
    from quinoa_tpu.ops.face_fused import fused_face_pass

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    TF = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mesh = box_tet_mesh(n, n, n)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    solver.accum_plan = build_accum_plan(geom, TF=TF, W=TF)
    plan = solver.accum_plan
    state = solver.initial_state()
    state = solver.nsteps(state, 2)
    U = state.u

    full = t(lambda s: solver.step(s), state)
    print(f"full fused step      : {full:7.1f} ms")

    rhs_f = jax.jit(lambda g, p, u: dg_rhs(system, g, u, None, 0.0,
                                           accum_plan=p, face_gp=False))
    print(f"rhs fused            : {t(rhs_f, geom, plan, U):7.1f} ms")

    rhs_x = jax.jit(lambda g, u: dg_rhs(system, g, u, None, 0.0,
                                        accum_plan=None, face_gp=False))
    print(f"rhs xla              : {t(rhs_x, geom, U):7.1f} ms")

    ffp = jax.jit(lambda g, p, u: fused_face_pass(system, g, p, u))
    print(f"fused face pass only : {t(ffp, geom, plan, U):7.1f} ms")

    ffpc = jax.jit(lambda g, p, u: fused_face_pass(system, g, p, u,
                                                   emit_charvel=True))
    print(f"fused face + charvel : {t(ffpc, geom, plan, U):7.1f} ms")

    dtf = jax.jit(lambda g, u: dg_dt(system, g, u, None))
    print(f"dg_dt (xla sweep)    : {t(dtf, geom, U):7.1f} ms")

    lim = jax.jit(lambda g, u: solver._limit(g, u, None))
    print(f"limiter              : {t(lim, geom, U):7.1f} ms")


if __name__ == "__main__":
    main()
