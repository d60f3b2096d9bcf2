"""Decompose the Sedov DG(P1) step on the real chip: where do the ms go?

Times jitted sub-pieces in isolation (directionally useful to find the
big rocks; final decisions are always re-measured on the FUSED step,
per ROADMAP's lesson).  Usage: python tools/profile_dg.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import (
        build_dggeom, BC_SYMMETRY, dg_rhs, dg_dt, uview, eval_basis_cm,
    )
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.pde.limiter import superbee_p1
    from quinoa_tpu.inciter.dg import DGSolver
    from quinoa_tpu.ops.face_accum import (
        build_accum_plan, accumulate_faces, gather_left_states,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    mesh = box_tet_mesh(n, n, n)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    plan = solver.accum_plan
    state = solver.initial_state()
    C, K = system.ncomp, geom.ndof
    E, F = geom.nelem, geom.nface
    print(f"E={E} F={F} C={C} K={K} dtype={geom.vol.dtype}")

    s1 = solver.step(state)
    jax.block_until_ready(s1.u)
    t0 = time.perf_counter()
    reps = 5
    s = state
    for _ in range(reps):
        s = solver.step(s)
    jax.block_until_ready(s.u)
    step_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"FUSED step              {step_ms:8.1f} ms")

    U = state.u

    rhs = jax.jit(lambda g, p, u: dg_rhs(system, g, u, None, 0.0,
                                         accum_plan=p, face_gp=False))
    print(f"rhs (pallas accum)      {timeit(rhs, geom, plan, U):8.1f} ms  (x3 per step)")

    rhs_x = jax.jit(lambda g, u: dg_rhs(system, g, u, None, 0.0,
                                        accum_plan=None, face_gp=False))
    print(f"rhs (fose gathers)      {timeit(rhs_x, geom, U):8.1f} ms")

    dtf = jax.jit(lambda g, u: dg_dt(system, g, u, None))
    print(f"dg_dt                   {timeit(dtf, geom, U):8.1f} ms  (x1 per step)")

    lim = jax.jit(lambda g, u: superbee_p1(g, u, None, C))
    try:
        print(f"superbee limiter        {timeit(lim, geom, U):8.1f} ms  (x3 per step)")
    except Exception as e:
        print("limiter needs dofmask:", type(e).__name__)
        kk = jnp.arange(K)[:, None]
        dofmask = (kk < jnp.full((1, E), K)).astype(geom.vol.dtype)
        lim = jax.jit(lambda g, u, m: superbee_p1(g, u, m, C))
        print(f"superbee limiter        {timeit(lim, geom, U, dofmask):8.1f} ms  (x3 per step)")

    # pieces inside the rhs face pass
    gl = jax.jit(lambda p, u: gather_left_states(p, u, C, K))
    print(f"  gather L states (pl)  {timeit(gl, plan, U):8.1f} ms")

    ger = jax.jit(lambda g, u: uview(u, C, K)[:, :, g.er])
    print(f"  gather R states (xla) {timeit(ger, geom, U):8.1f} ms")

    gel = jax.jit(lambda g, u: uview(u, C, K)[:, :, g.el])
    print(f"  gather L states (xla) {timeit(gel, geom, U):8.1f} ms")

    bl = jax.jit(lambda g: eval_basis_cm(K, g.xi_l))
    print(f"  eval B_l              {timeit(bl, geom):8.1f} ms  (x2: B_r too)")

    def face_flux(g, u):
        Uv = uview(u, C, K)
        B_l = eval_basis_cm(K, g.xi_l)
        B_r = eval_basis_cm(K, g.xi_r)
        sL = jnp.einsum("kgf,ckf->cgf", B_l, Uv[:, :, g.el])
        sR = jnp.einsum("kgf,ckf->cgf", B_r, Uv[:, :, g.er])
        fnf = g.fn[:, None, :]
        interior = g.bctype == 0
        sR = jnp.where(interior, sR, system.bc_state(g.bctype, sL, fnf, None, 0.0))
        fl = system.riemann(fnf, sL, sR, None, 0.0)
        wt = jnp.asarray(g.tables["w_face"], dtype=u.dtype)[:, None] * (
            g.farea * g.fmask)
        cL = -jnp.einsum("kgf,gf,cgf->ckf", B_l, wt, fl)
        cR = jnp.einsum("kgf,gf,cgf->ckf", B_r, wt, fl)
        return cL, cR

    ff = jax.jit(face_flux)
    print(f"  full face pass -accum {timeit(ff, geom, U):8.1f} ms")

    cL, cR = ff(geom, U)
    acc = jax.jit(lambda p, a, b: accumulate_faces(p, a, b, C, K))
    print(f"  pallas accumulation   {timeit(acc, plan, cL, cR):8.1f} ms")

    def vol_pass(g, u):
        tb = g.tables
        Uv = uview(u, C, K)
        B_vol = jnp.asarray(tb["B_vol"], dtype=u.dtype)
        xi_vol = jnp.asarray(tb["xi_vol"].T, dtype=u.dtype)
        wdB = jnp.asarray(tb["w_vol"][:, None, None] * tb["dBdxi_vol"],
                          dtype=u.dtype)
        state_ = jnp.einsum("gk,cke->cge", B_vol, Uv)
        gp = (g.node0[:, None, :] + jnp.einsum("ime,mg->ige", g.Jmat, xi_vol))
        Fj = system.flux_cols(state_, gp, 0.0)
        Fref = jnp.stack([
            sum(Fj[j] * g.jacInv[m, j] for j in range(3)) for m in range(3)])
        Rv = jnp.einsum("gkm,mcge->cke", wdB, Fref)
        return Rv * (g.vol * g.emask)

    vp = jax.jit(vol_pass)
    print(f"  volume pass           {timeit(vp, geom, U):8.1f} ms")


if __name__ == "__main__":
    main()
