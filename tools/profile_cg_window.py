"""Measure windowed node gather/assembly vs the XLA nsup path on chip.

Usage: PYTHONPATH=/root/repo python tools/profile_cg_window.py [n=48] [C=2]

Methodology (verify skill): chained dispatches + host readback barrier;
never trust block_until_ready on axon.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                     hilbert_element_reorder)
from quinoa_tpu.ops.assembly import (build_nsup, gather_nodes,
                                     assemble_add, assemble_max)
from quinoa_tpu.ops.node_window import (
    build_node_plan, gather_nodes_window, assemble_add_window,
    assemble_max_window)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
C = int(sys.argv[2]) if len(sys.argv) > 2 else 2

mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
mesh, _ = hilbert_element_reorder(mesh)
mesh, _ = first_touch_node_reorder(mesh)
N, E = mesh.nnode, mesh.nelem
print(f"mesh {n}^3: N={N} E={E} S={4*E}")

t0 = time.time()
plan = build_node_plan(mesh.inpoel, N, TF=128, W=1024, dtype=np.float32)
print(f"plan built in {time.time()-t0:.1f}s  nfar={plan.nfar} "
      f"({100.0*plan.nfar/plan.S:.1f}%)  FTS={plan.FTS} WF={plan.WF}")

inpoelT = jnp.asarray(mesh.inpoel.T)
nsup_np, D = build_nsup(mesh.inpoel, N)
nsup = jnp.asarray(nsup_np)
print(f"nsup D={D}")

rng = np.random.default_rng(0)
U0 = jnp.asarray(rng.normal(size=(C, N)).astype(np.float32))
C0 = jnp.asarray(rng.normal(size=(4, C, E)).astype(np.float32))


def timeit(name, fn, x, iters=20):
    f = jax.jit(fn)
    y = f(x)
    jax.block_until_ready(y)
    # chained: feed a reduced slice of the output back into the input
    t0 = time.time()
    x_ = x
    for i in range(iters):
        y = f(x_)
        # chain: perturb input by a scalar derived from output
        s = jnp.sum(y[..., :1]) * 1e-30
        x_ = x + s
    _ = float(jnp.sum(y))
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


# gather: (C, N) -> (4, C, E)
timeit("gather XLA", lambda u: gather_nodes(u, inpoelT), U0)
timeit("gather window", lambda u: gather_nodes_window(plan, u), U0)

# assemble_add: (4, C, E) -> (C, N)
timeit("assemble_add XLA", lambda c: assemble_add(c, nsup), C0)
timeit("assemble_add window", lambda c: assemble_add_window(plan, c), C0)

# assemble_max
timeit("assemble_max XLA", lambda c: assemble_max(c, nsup), C0)
timeit("assemble_max window", lambda c: assemble_max_window(plan, c), C0)

# stacked variants as the step actually runs them (2C rows)
C2 = jnp.concatenate([C0, C0], axis=1)
U2 = jnp.concatenate([U0, U0], axis=0)
timeit(f"gather XLA 2C={2*C}", lambda u: gather_nodes(u, inpoelT), U2)
timeit(f"gather window 2C={2*C}",
       lambda u: gather_nodes_window(plan, u), U2)
timeit(f"assemble_add XLA 2C", lambda c: assemble_add(c, nsup), C2)
timeit(f"assemble_add window 2C",
       lambda c: assemble_add_window(plan, c), C2)
timeit(f"assemble_max XLA 2C", lambda c: assemble_max(c, nsup), C2)
timeit(f"assemble_max window 2C",
       lambda c: assemble_max_window(plan, c), C2)
