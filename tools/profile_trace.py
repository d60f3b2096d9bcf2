"""Per-kernel breakdown of the bench step from a jax.profiler trace.

Runs the exact bench.py configuration, traces a few steps, and
aggregates device-lane op durations from the trace so the dependent-
pass costs are measured IN the full step (not in isolation, which
ROADMAP's rules forbid).  Usage: python tools/profile_trace.py [n]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
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

    state = solver.step(state)
    state = solver.step(state)
    float(jnp.sum(state.u))

    tdir = "/tmp/dgtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for _ in range(3):
        state = solver.step(state)
    float(jnp.sum(state.u))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"3 steps: {dt*1e3:.1f} ms ({dt/3*1e3:.1f} ms/step)")

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files found under", tdir)
        return
    agg = collections.Counter()
    cnt = collections.Counter()
    lanes = {}
    for fn in files:
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                lanes[(ev.get("pid"), ev.get("tid"))] = \
                    ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            lane = lanes.get((ev.get("pid"), ev.get("tid")), "")
            if "XLA Op" in lane or "TensorFlow Op" in lane \
                    or "Steps" in lane:
                continue
            nm = ev.get("name", "?")
            agg[(lane, nm)] += ev.get("dur", 0)
            cnt[(lane, nm)] += 1
    # show the busiest lanes and their top ops
    bylane = collections.Counter()
    for (lane, nm), d in agg.items():
        bylane[lane] += d
    for lane, tot in bylane.most_common(6):
        print(f"\n== lane {lane!r}: total {tot/1e3:.1f} ms")
        rows = [(d, c, nm) for (ln, nm), d in agg.items()
                if ln == lane for c in [cnt[(ln, nm)]]]
        for d, c, nm in sorted(rows, reverse=True)[:25]:
            print(f"  {d/1e3:9.2f} ms  x{c:4d}  {nm[:100]}")


if __name__ == "__main__":
    main()
