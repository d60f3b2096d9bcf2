"""Stochastic/ordinary differential equation systems (walker's kernels).

Counterpart of the reference's src/DiffEq/ layer (DiffEq.hpp:38-117 and the
13 systems under Beta/, Dirichlet/, OrnsteinUhlenbeck/, Gamma/, SkewNormal/,
WrightFisher/, Position/, Dissipation/, Velocity/): each system is a small
dataclass whose `advance` is an ensemble-vectorized Euler-Maruyama update —
the reference's per-particle loops become one fused array expression over
the (npar, ncomp) slab, with jax.random supplying the counter-based
Gaussian draws (Random123 analog).
"""

from .systems import (
    DiagOrnsteinUhlenbeck,
    OrnsteinUhlenbeck,
    Beta,
    NumberFractionBeta,
    MassFractionBeta,
    MixNumberFractionBeta,
    MixMassFractionBeta,
    Dirichlet,
    GeneralizedDirichlet,
    MixDirichlet,
    Gamma,
    SkewNormal,
    WrightFisher,
    Position,
    Dissipation,
    Velocity,
)
from .initpolicy import (
    init_zero,
    init_raw,
    init_jointdelta,
    init_jointbeta,
    init_jointgaussian,
    init_jointcorrgaussian,
    init_jointgamma,
)

__all__ = [
    "DiagOrnsteinUhlenbeck",
    "OrnsteinUhlenbeck",
    "Beta",
    "NumberFractionBeta",
    "MassFractionBeta",
    "MixNumberFractionBeta",
    "MixMassFractionBeta",
    "Dirichlet",
    "GeneralizedDirichlet",
    "MixDirichlet",
    "Gamma",
    "SkewNormal",
    "WrightFisher",
    "Position",
    "Dissipation",
    "Velocity",
    "init_zero",
    "init_raw",
    "init_jointdelta",
    "init_jointbeta",
    "init_jointgaussian",
    "init_jointcorrgaussian",
    "init_jointgamma",
]
