"""Solution diagnostics: L2 norms and analytic-error norms.

Counterpart of NodeDiagnostics/ElemDiagnostics + Transporter::diagnostics
(src/Inciter/NodeDiagnostics.cpp:51-140, src/Inciter/Transporter.cpp:873-930):
per-node/element weighted sums reduced globally, finalized as
sqrt(sum(A_i^2 V_i) / total_volume); Linf is a plain max.  The reference's
custom DiagReducer merge becomes a psum/pmax in the sharded path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class DiagRow:
    """One diagnostics output row (mirrors the reference's diag file)."""

    it: int
    t: float
    dt: float
    l2sol: list
    l2err: Optional[list]
    linferr: Optional[list]


class Diagnostics:
    """Compute L2(sol) and, when an analytic solution exists, L2/Linf(err)."""

    def __init__(self, system, geom):
        self.system = system
        self.geom = geom
        self.total_vol = float(geom.vol.sum())

    def compute(self, state) -> DiagRow:
        u = state.u  # (C, N)
        vol = self.geom.vol[None, :]
        l2sol = jnp.sqrt((u * u * vol).sum(axis=1) / self.total_vol)

        l2err = linferr = None
        if hasattr(self.system, "analytic"):
            # evaluated at t (state.t already advanced past the step,
            # matching the reference's d.T()+d.Dt() convention)
            a = self.system.analytic(self.geom.coords, state.t).astype(u.dtype)
            e = u - a
            l2err = jnp.sqrt((e * e * vol).sum(axis=1) / self.total_vol)
            linferr = jnp.abs(e).max(axis=1)

        return DiagRow(
            it=int(state.it),
            t=float(state.t),
            dt=float(state.dt),
            l2sol=[float(v) for v in l2sol],
            l2err=None if l2err is None else [float(v) for v in l2err],
            linferr=None if linferr is None else [float(v) for v in linferr],
        )
