"""Per-op breakdown of the DiagCG bench step from a jax.profiler trace.

Same harness as tools/profile_trace.py but for the bench_cg.py
configuration (SlotCyl DiagCG+FCT at 48^3/64^3): traces 3 steps and
aggregates the XLA Ops lane so the dependent gather/assembly chain's
per-round costs are measured IN the full step.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cg_trace.py [n]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)

    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    solver = DiagCGSolver(
        CGTransport(SlotCyl()), make_cggeom(mesh), cfl=0.8,
        bcnodes=mesh.all_bnodes(),
    )
    state = solver.initial_state()
    state = solver.step(state)
    state = solver.step(state)
    float(jnp.sum(state.u))

    tdir = "/tmp/cgtrace"
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
    lanes = {}
    agg = collections.Counter()
    cnt = collections.Counter()
    args = {}
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
            if lanes.get((ev.get("pid"), ev.get("tid")), "") != "XLA Ops":
                continue
            nm = ev.get("name", "?")
            agg[nm] += ev.get("dur", 0)
            cnt[nm] += 1
            if nm not in args:
                args[nm] = ev.get("args", {})
    tot = sum(agg.values())
    print(f"XLA Ops total {tot/1e3:.1f} ms over 3 steps "
          f"-> {tot/3e3:.1f} ms/step")
    for nm, d in agg.most_common(35):
        extra = args[nm].get("long_name", "")[:120]
        print(f"{d/3e3:8.3f} ms/step x{cnt[nm]//3:3d}  {nm}   | {extra}")


if __name__ == "__main__":
    main()
