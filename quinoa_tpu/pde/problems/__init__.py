"""Problem policies: initial/analytic solutions, prescribed velocities, BCs.

Counterpart of the reference's Problem policy classes
(src/PDE/Transport/Problem/, src/PDE/CompFlow/Problem/), as vectorized jnp
functions evaluated over (n,3) coordinate arrays — usable inside jit for
initial conditions, Dirichlet-BC increments, and analytic-error diagnostics.
"""

from .transport import SlotCyl, GaussHump, CylAdvect, ShearDiff
from .compflow import (
    VorticalFlow,
    TaylorGreen,
    SodShocktube,
    RotatedSodShocktube,
    SedovBlastwave,
    NLEnergyGrowth,
    RayleighTaylor,
    UserDefined,
)

__all__ = [
    "SlotCyl",
    "GaussHump",
    "CylAdvect",
    "ShearDiff",
    "VorticalFlow",
    "TaylorGreen",
    "SodShocktube",
    "RotatedSodShocktube",
    "SedovBlastwave",
    "NLEnergyGrowth",
    "RayleighTaylor",
    "UserDefined",
]
