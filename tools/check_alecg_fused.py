"""On-chip check: fused ALECG kernels (QUINOA_CG_FUSED=1) vs the XLA path.

The CPU-side parity suite (tests/test_alecg_fused.py) validates the
fused ALECG window passes in interpret mode; this tool re-runs the same
comparisons NON-interpret on the real device: a few full solver steps
each way, compared on the diagnostics rows.  (The DiagCG flavors this
tool used to check were removed with the losing DiagCG megakernel.)

Usage: QUINOA_CG_FUSED must NOT be preset; the tool sets/unsets it
around solver construction.  `python tools/check_alecg_fused.py [n]`
(default n=16; 48 for a bench-sized run).
"""

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.dirname(_os_.path.dirname(_os_.path.abspath(__file__))))

import os
import sys
import time

import numpy as np


def _diag_rows(solver, diag, nsteps, t0=0.0):
    import jax.numpy as jnp

    s = solver.initial_state(t0=t0)
    rows = []
    for _ in range(nsteps):
        s = solver.step(s)
        out = diag.compute(s)
        l2 = np.array(out[0] if isinstance(out, tuple) else out.l2sol)
        rows.append(l2)
    float(jnp.sum(s.u))  # host readback barrier (axon)
    return np.array(rows)


def _compare(label, build, nsteps=3):
    # separately-traced programs differ by FMA-contraction choices
    # (~1 ulp/op; ROADMAP "Reference semantics"): gate at ~1e2 ulps of
    # the state dtype — real breakage shows up at >1e-3
    import jax

    tol = 1e-10 if jax.config.read("jax_enable_x64") else 2e-5
    os.environ.pop("QUINOA_CG_FUSED", None)
    t0 = time.perf_counter()
    ref = _diag_rows(*build(), nsteps)
    t_ref = time.perf_counter() - t0
    os.environ["QUINOA_CG_FUSED"] = "1"
    try:
        t0 = time.perf_counter()
        fused = _diag_rows(*build(), nsteps)
        t_fused = time.perf_counter() - t0
    finally:
        os.environ.pop("QUINOA_CG_FUSED", None)
    rel = np.abs(fused - ref) / np.maximum(np.abs(ref), 1e-300)
    ok = rel.max() < tol
    print(f"{label}: max rel diag diff {rel.max():.3e} "
          f"({'OK' if ok else 'FAIL'}); xla {t_ref:.2f}s "
          f"fused {t_fused:.2f}s (incl compile)")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import hilbert_element_reorder

    mesh = box_tet_mesh(n, n, n)
    mesh, _ = hilbert_element_reorder(mesh)
    ok = True

    def alecg_transport():
        from quinoa_tpu.pde.cg import CGTransport
        from quinoa_tpu.pde.problems import SlotCyl
        from quinoa_tpu.inciter.alecg import make_alecg
        from quinoa_tpu.inciter import Diagnostics

        solver = make_alecg(CGTransport(SlotCyl()), mesh, cfl=0.8,
                            bcnodes=mesh.all_bnodes())
        return solver, Diagnostics(solver.system, solver.geom)

    def alecg_compflow():
        from quinoa_tpu.pde.cg_compflow import CGCompFlow
        from quinoa_tpu.pde.problems import VorticalFlow
        from quinoa_tpu.inciter.alecg import make_alecg
        from quinoa_tpu.inciter import Diagnostics

        solver = make_alecg(CGCompFlow(VorticalFlow()), mesh, cfl=0.5,
                            bcnodes=mesh.all_bnodes())
        return solver, Diagnostics(solver.system, solver.geom)

    ok &= _compare("alecg transport", alecg_transport)
    ok &= _compare("alecg compflow", alecg_compflow)
    print("check_alecg_fused:", "ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
