"""Is charvel slow per se, or is it the fusion with the state gathers?"""

import sys
import time

import jax
import jax.numpy as jnp


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

    sf = jax.jit(states)
    sL, sR = sf(geom, U)
    jax.block_until_ready(sL)

    def charvel_only(g, a, b):
        fnf = g.fn[:, None, :]
        return system.charvel(a, fnf, None), system.charvel(b, fnf, None)

    print(f"charvel on materialized   {timeit(jax.jit(charvel_only), geom, sL, sR):8.1f} ms")

    def riemann_only(g, a, b):
        fnf = g.fn[:, None, :]
        return system.riemann(fnf, a, b, None, 0.0)

    print(f"riemann on materialized   {timeit(jax.jit(riemann_only), geom, sL, sR):8.1f} ms")

    def states_charvel_L(g, u):
        Uv = uview(u, C, K)
        B_l = eval_basis_cm(K, g.xi_l)
        sL_ = jnp.einsum("kgf,ckf->cgf", B_l, Uv[:, :, g.el])
        fnf = g.fn[:, None, :]
        return system.charvel(sL_, fnf, None)

    print(f"states+charvel L only     {timeit(jax.jit(states_charvel_L), geom, U):8.1f} ms")

    def states_sum(g, u):
        a, b = states(g, u)
        return a.sum(), b.sum()

    print(f"states -> scalar sum      {timeit(jax.jit(states_sum), geom, U):8.1f} ms")


if __name__ == "__main__":
    main()
