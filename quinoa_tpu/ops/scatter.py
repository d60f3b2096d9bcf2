"""Gather/scatter between element-node slots and mesh nodes.

These are the two primitives underneath every continuous-Galerkin operator:
the reference's per-element gather (``tk::Fields::extract`` over inpoel) and
scatter-add (``R.var(r,N[a]) += ...``) loops (e.g. src/PDE/Transport/
CGTransport.hpp rhs, src/Inciter/FluxCorrector.cpp) become two dense XLA
segment ops over the [E,4] connectivity table.

On TPU, `segment_sum` with sorted segment ids lowers to an efficient
one-pass scatter; the connectivity is pre-sorted host-side by the mesh
reorder pass (quinoa_tpu.mesh.reorder) to maximize locality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_nodes(U: jnp.ndarray, inpoel: jnp.ndarray) -> jnp.ndarray:
    """Gather nodal fields to element-node slots.

    U: (nnode, ncomp); inpoel: (nelem, 4) -> (nelem, 4, ncomp).
    """
    return U[inpoel]


def scatter_add_nodes(
    contrib: jnp.ndarray, inpoel: jnp.ndarray, nnode: int
) -> jnp.ndarray:
    """Scatter-add element-node contributions to nodes.

    contrib: (nelem, 4, ncomp) -> (nnode, ncomp).

    Uses jnp scatter-add; padded elements must carry zero contributions
    (their rows in `inpoel` may point at any valid node).
    """
    E4 = contrib.shape[0] * contrib.shape[1]
    flat = contrib.reshape(E4, -1)
    ids = inpoel.reshape(E4)
    return jnp.zeros((nnode, flat.shape[1]), dtype=contrib.dtype).at[ids].add(flat)


def scatter_max_nodes(
    contrib: jnp.ndarray, inpoel: jnp.ndarray, nnode: int, initial: float
) -> jnp.ndarray:
    """Scatter-max element-node values to nodes (init with `initial`)."""
    E4 = contrib.shape[0] * contrib.shape[1]
    flat = contrib.reshape(E4, -1)
    ids = inpoel.reshape(E4)
    init = jnp.full((nnode, flat.shape[1]), initial, dtype=contrib.dtype)
    return init.at[ids].max(flat)


def scatter_min_nodes(
    contrib: jnp.ndarray, inpoel: jnp.ndarray, nnode: int, initial: float
) -> jnp.ndarray:
    """Scatter-min element-node values to nodes (init with `initial`)."""
    E4 = contrib.shape[0] * contrib.shape[1]
    flat = contrib.reshape(E4, -1)
    ids = inpoel.reshape(E4)
    init = jnp.full((nnode, flat.shape[1]), initial, dtype=contrib.dtype)
    return init.at[ids].min(flat)
