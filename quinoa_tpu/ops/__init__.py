"""Device-side compute primitives (JAX/XLA/Pallas).

The unstructured-mesh analog of an ML framework's op library: gather/scatter
segment ops, element geometry tables, quadrature/basis tables, Riemann fluxes,
limiters, and equations of state.  Everything here is jit-safe, static-shape,
and dtype-generic.
"""

from .scatter import scatter_add_nodes, gather_nodes, scatter_max_nodes, scatter_min_nodes

__all__ = [
    "scatter_add_nodes",
    "gather_nodes",
    "scatter_max_nodes",
    "scatter_min_nodes",
]
