"""Secondary benchmark: ALECG node-updates/sec/chip on SlotCyl.

Not consumed by the driver (bench.py is the single JSON line); run
manually — the reference's published scaling story is ALECG
(doc/pages/inciter_performance.dox), so this tracks the analog:

    python bench_alecg.py [n]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from quinoa_tpu.inciter.alecg import make_alecg
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg import CGTransport
    from quinoa_tpu.pde.problems import SlotCyl

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    solver = make_alecg(CGTransport(SlotCyl()), mesh, cfl=0.8,
                        bcnodes=mesh.all_bnodes())
    state = solver.initial_state()

    nsteps = 10
    state = solver.step(state)
    float(jnp.sum(state.u))  # readback barrier (axon rules)

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = solver.step(state)
    float(jnp.sum(state.u))
    dt = time.perf_counter() - t0

    assert np.isfinite(np.asarray(state.u)).all()
    ups = mesh.nnode * nsteps / dt
    print(json.dumps({
        "metric": "node_updates_per_sec_slotcyl_alecg",
        "value": round(ups, 1),
        "unit": "node-updates/s/chip",
        "nnode": mesh.nnode,
        "ms_per_step": round(dt / nsteps * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
