"""Benchmark: node-updates/sec/chip on the flagship inciter solver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship configuration: DiagCG+FCT scalar transport (SlotCyl) on a
unit-box tet mesh — BASELINE.json config #1.  Will switch to Sedov DG(P1)
Euler (the north-star metric) once the DG stack lands.

vs_baseline normalizes against the reference-CPU anchor implied by
BASELINE.md: the goal is >=10x node-updates/sec vs a 64-rank Charm++ CPU
run.  The reference publishes no absolute grind times, so we anchor the
CPU estimate at 2.0e6 node-updates/sec for 64 ranks (~30k updates/s/rank
for a ~1us/node/rhs CG+FCT sweep — order-of-magnitude from the published
overdecomposition plots); vs_baseline = value / 2.0e6.
"""

import json
import time

import jax
import numpy as np

CPU_REFERENCE_NODE_UPDATES_PER_SEC = 2.0e6  # 64-rank Charm++ estimate


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver

    n = 48  # 48^3 hexes * 6 tets = 663552 tets, 117649 nodes
    mesh = box_tet_mesh(n, n, n)
    solver = DiagCGSolver(
        CGTransport(SlotCyl()),
        make_cggeom(mesh),
        cfl=0.5,
        bcnodes=mesh.all_bnodes(),
    )
    state = solver.initial_state()

    nsteps = 20
    # warmup/compile
    warm = solver.nsteps(state, nsteps)
    jax.block_until_ready(warm.u)

    t0 = time.perf_counter()
    state = solver.nsteps(state, nsteps)
    jax.block_until_ready(state.u)
    dt = time.perf_counter() - t0

    assert np.isfinite(np.asarray(state.u)).all()
    node_updates_per_sec = mesh.nnode * nsteps / dt

    print(
        json.dumps(
            {
                "metric": "node_updates_per_sec_diagcg_fct_slotcyl",
                "value": round(node_updates_per_sec, 1),
                "unit": "node-updates/s/chip",
                "vs_baseline": round(
                    node_updates_per_sec / CPU_REFERENCE_NODE_UPDATES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
