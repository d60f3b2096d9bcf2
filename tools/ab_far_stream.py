"""On-chip A/B of the far-stream right-state variants (ROADMAP lever).

Runs the FUSED Sedov DG(P1) bench step (the bench.py configuration)
under each far-stream mode and prints ms/step + updates/s:

  default : CK-row (20-row) UvRf XLA gather (above the 16-row cliff)
  split   : QUINOA_SPLIT_FAR_GATHER=1, two <=10-row gathers
  far_sr  : QUINOA_FAR_SR=1, er-sorted in-window rstate pass (C*G rows)

The env var is read at TRACE time, so each mode jits its own step.
Usage: python tools/ab_far_stream.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_mode(mode_env, n):
    # far_sr is the default since the round-3 on-chip A/B: force it
    # OFF for the gather modes so they actually run the gather path
    os.environ.pop("QUINOA_SPLIT_FAR_GATHER", None)
    os.environ["QUINOA_FAR_SR"] = "0"
    if mode_env:
        os.environ[mode_env] = "1"

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import hilbert_element_reorder
    from quinoa_tpu.pde.dg import build_dggeom, BC_SYMMETRY
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.inciter.dg import DGSolver

    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = DGSolver(system, geom, cfl=0.5, limiter="superbeep1")
    state = solver.initial_state()

    nsteps = 10
    state = solver.step(state)
    float(jnp.sum(state.u))  # readback barrier (axon)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = solver.step(state)
    float(jnp.sum(state.u))
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(state.u)).all()
    ms = dt / nsteps * 1e3
    ups = mesh.nelem * nsteps / dt
    return ms, ups


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    print("backend:", jax.default_backend(), flush=True)
    for name, env in [("default", None),
                      ("split", "QUINOA_SPLIT_FAR_GATHER"),
                      ("far_sr", "QUINOA_FAR_SR")]:
        ms, ups = bench_mode(env, n)
        print(f"{name:8s}: {ms:7.1f} ms/step  {ups/1e6:6.2f}M updates/s",
              flush=True)


if __name__ == "__main__":
    main()
