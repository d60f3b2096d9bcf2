"""Per-op breakdown of the SPMD (shard_map) bench step at npes=1.

VERDICT r3 weak #4: the stacked-plan shard_map step measured ~4.6%
below the single-device step at npes=1 with no analysis.  This traces
3 steps of bench.py's main_spmd configuration and aggregates the XLA
Ops lane, to be diffed against tools/profile_trace.py's single-device
breakdown (same mesh, same physics).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_spmd_trace.py [npes]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    npes = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from jax.sharding import Mesh
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import hilbert_element_reorder
    from quinoa_tpu.pde.dg import BC_SYMMETRY
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.parallel.dg_shard import build_dg_shards
    from quinoa_tpu.parallel.dg_spmd import SPMDDGSolver, AXIS

    n = 48
    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    mesh, _ = hilbert_element_reorder(mesh)
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    sharded = build_dg_shards(mesh, npes, ndof=4, bc_sidesets=bc)
    dmesh = Mesh(np.array(jax.devices()[:npes]), (AXIS,))
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    solver = SPMDDGSolver(system, sharded, dmesh, cfl=0.5,
                          limiter="superbeep1")
    state = solver.initial_state()
    state = solver.step(state)
    state = solver.step(state)
    float(jnp.sum(state.u))

    tdir = "/tmp/spmdtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for _ in range(3):
        state = solver.step(state)
    float(jnp.sum(state.u))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"3 steps: {dt*1e3:.1f} ms ({dt/3*1e3:.1f} ms/step, "
          f"{mesh.nelem * 3 / dt / 1e6:.2f}M updates/s)")

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
