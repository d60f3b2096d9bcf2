"""Decompose dg_dt on the chip: which sub-op costs 300 ms?"""

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
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import (
        build_dggeom, BC_SYMMETRY, uview, eval_basis_cm,
    )
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.inciter.dg import DGSolver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    mesh = box_tet_mesh(n, n, n)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    U = solver.initial_state().u
    C, K = system.ncomp, geom.ndof

    def states(g, u):
        Uv = uview(u, C, K)
        B_l = eval_basis_cm(K, g.xi_l)
        B_r = eval_basis_cm(K, g.xi_r)
        sL = jnp.einsum("kgf,ckf->cgf", B_l, Uv[:, :, g.el])
        sR = jnp.einsum("kgf,ckf->cgf", B_r, Uv[:, :, g.er])
        return sL, sR

    print(f"states                {timeit(jax.jit(states), geom, U):8.1f} ms")

    def plus_charvel(g, u):
        sL, sR = states(g, u)
        fnf = g.fn[:, None, :]
        return system.charvel(sL, fnf, None), system.charvel(sR, fnf, None)

    print(f"+charvel              {timeit(jax.jit(plus_charvel), geom, U):8.1f} ms")

    def plus_mx(g, u):
        vl, vr = plus_charvel(g, u)
        interior = g.bctype == 0
        wt = jnp.asarray(g.tables["w_face"], dtype=u.dtype)[:, None] * (
            g.farea * g.fmask)
        return (wt * jnp.where(interior, jnp.maximum(vl, vr), vl)).sum(0)

    print(f"+mx                   {timeit(jax.jit(plus_mx), geom, U):8.1f} ms")

    def plus_fose(g, u):
        mx = plus_mx(g, u)
        delt = sum(mx[g.fose[i]] for i in range(4))
        big = jnp.asarray(jnp.finfo(u.dtype).max, dtype=u.dtype)
        elemdt = g.vol / jnp.maximum(delt, 1e-300)
        return jnp.where(g.emask > 0, elemdt, big).min()

    print(f"+fose+min (=dg_dt)    {timeit(jax.jit(plus_fose), geom, U):8.1f} ms")

    # suspicion: the 1e-300 f64 literal upcasts something?
    def plus_fose32(g, u):
        mx = plus_mx(g, u)
        delt = sum(mx[g.fose[i]] for i in range(4))
        big = jnp.asarray(jnp.finfo(u.dtype).max, dtype=u.dtype)
        elemdt = g.vol / jnp.maximum(delt, jnp.asarray(1e-30, u.dtype))
        return jnp.where(g.emask > 0, elemdt, big).min()

    print(f"+fose+min (f32 eps)   {timeit(jax.jit(plus_fose32), geom, U):8.1f} ms")


if __name__ == "__main__":
    main()
