"""Secondary benchmark: DiagCG+FCT node-updates/sec/chip on SlotCyl.

Not consumed by the driver (bench.py is the single JSON line); run
manually to catch CG-path perf regressions:

    python bench_cg.py [n]

Configuration: SlotCyl advection, DiagCG + FCT, CFL stepping, Dirichlet
walls — the analog of tests/regression/inciter/transport/SlotCyl
(slotcyl_diagcg), the reference's machine-precision-parity scheme.
"""

import json
import sys
import time

import jax
import numpy as np


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # windowed node kernels measured SLOWER end-to-end (see ROADMAP
    # "CG" note) — opt-in for re-measurement only
    window = "--window" in sys.argv
    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    # locality passes behind the windowed node kernels
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    solver = DiagCGSolver(
        CGTransport(SlotCyl()), make_cggeom(mesh, window=window), cfl=0.8,
        bcnodes=mesh.all_bnodes(),
    )
    state = solver.initial_state()

    import jax.numpy as jnp

    nsteps = 10
    # chained states + a host READBACK as the barrier:
    # block_until_ready is unreliable on the axon backend for small
    # buffers, and re-dispatching warmup inputs can be memoized
    state = solver.step(state)
    float(jnp.sum(state.u))

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = solver.step(state)
    float(jnp.sum(state.u))
    dt = time.perf_counter() - t0

    assert np.isfinite(np.asarray(state.u)).all()
    ups = mesh.nnode * nsteps / dt
    print(json.dumps({
        "metric": "node_updates_per_sec_slotcyl_diagcg_fct",
        "value": round(ups, 1),
        "unit": "node-updates/s/chip",
        "nnode": mesh.nnode,
        "ms_per_step": round(dt / nsteps * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
