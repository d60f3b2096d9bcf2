"""On-chip check: fused face kernel vs the XLA face pass.

1. rhs comparison on a PHYSICAL smooth state (constant-ish density with
   small higher-dof perturbations — random dofs make rho negative at
   face Gauss points and both paths produce garbage);
2. full Sedov run both ways, comparing the diag history (the validation
   the round-1 accumulation kernel used);
3. fused-step bench at the requested size.
"""

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.dirname(_os_.path.dirname(_os_.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY, dg_rhs
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave, TaylorGreen
    from quinoa_tpu.inciter.dg import DGSolver, DGDiagnostics
    from quinoa_tpu.ops.face_accum import build_accum_plan

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    TF = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mesh = box_tet_mesh(n, n, n)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    solver.accum_plan = build_accum_plan(geom, TF=TF, W=TF)
    plan = solver.accum_plan
    assert plan is not None
    E = geom.nelem
    C, K = 5, 4

    if n >= 32:  # bench only (validation runs at small n)
        state = solver.initial_state()
        s1 = solver.step(state)
        jax.block_until_ready(s1.u)
        t0 = time.perf_counter()
        reps = 10
        s = s1
        for _ in range(reps):
            s = solver.step(s)
        jax.block_until_ready(s.u)
        ms = (time.perf_counter() - t0) / reps * 1e3
        ups = mesh.nelem / (ms / 1e3)
        print(f"step {ms:.1f} ms -> {ups/1e6:.3f}M updates/s")
        return

    # physical smooth state: rho ~ 1, tiny slopes, p ~ 1
    rng = np.random.default_rng(0)
    U0 = np.zeros((C * K, E), np.float32)
    U0[0 * K] = 1.0 + 0.05 * rng.random(E)          # rho mean
    U0[4 * K] = 2.5 + 0.05 * rng.random(E)          # E mean
    U0[1 * K] = 0.1 * rng.random(E)                 # momenta
    for ck in range(C * K):
        if ck % K:
            U0[ck] = 0.01 * rng.random(E)           # small slopes
    U = jnp.asarray(U0)

    # The kernel computes its basis contractions as exact-f32 sums; the
    # XLA path's einsums run at TPU DEFAULT matmul precision (bf16
    # passes, ~2e-3 relative).  Compare against a highest-precision XLA
    # reference so the tolerance can stay tight (tools/debug_fused.py
    # showed 1.9e-9 per-face agreement at highest).
    # (both sides under highest so the shared VOLUME pass einsums match
    # too; the kernel's internal dots are precision="highest" already)
    with jax.default_matmul_precision("highest"):
        r_fused = jax.jit(
            lambda g, p, u: dg_rhs(system, g, u, None, 0.0, accum_plan=p,
                                   face_gp=False))(geom, plan, U)
        r_xla = jax.jit(
            lambda g, u: dg_rhs(system, g, u, None, 0.0, accum_plan=None,
                                face_gp=False))(geom, U)
    a, b = np.asarray(r_fused), np.asarray(r_xla)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    scale = np.abs(b).max()
    err = np.abs(a - b).max() / scale
    print(f"smooth rhs rel err (fused vs xla-highest): {err:.3e}  "
          f"scale={scale:.3e}")
    assert err < 2e-5, err

    # full Sedov run both ways: diag histories
    nsteps = 10
    diag = DGDiagnostics(system, geom)
    sF = solver.nsteps(solver.initial_state(), nsteps)
    l2F_, _, _ = diag.compute(sF)
    solver_x = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    solver_x.accum_plan = None
    sX = solver_x.nsteps(solver_x.initial_state(), nsteps)
    l2X_, _, _ = diag.compute(sX)
    l2F, l2X = np.asarray(l2F_), np.asarray(l2X_)
    print("sedov 10-step L2 fused:", l2F)
    print("sedov 10-step L2 xla:  ", l2X)
    rel = np.abs(l2F - l2X) / np.abs(l2X)
    print("rel diff:", rel)
    # the default-precision XLA face einsums differ from the kernel's
    # exact-f32 sums at bf16-pass level, compounding over 10 shock steps
    assert (rel < 5e-3).all(), rel



if __name__ == "__main__":
    main()
