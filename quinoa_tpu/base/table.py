"""Tabulated-function linear interpolation (tk::Table / tk::sample).

Used by the walker's hydro-timescale coefficient policies (the reference
tabulates b'(t), k'(t) in HydroTimeScales.hpp) and available for any
user-supplied time series.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Table:
    """Piecewise-linear y(x) with constant extrapolation, jit-safe."""

    def __init__(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if x.ndim != 1 or x.shape != y.shape:
            raise ValueError("x and y must be equal-length 1-D")
        if not (np.diff(x) > 0).all():
            raise ValueError("x must be strictly increasing")
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)

    def __call__(self, t):
        return jnp.interp(t, self.x, self.y)
