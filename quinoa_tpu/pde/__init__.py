"""PDE systems: continuous- and discontinuous-Galerkin spatial operators.

Counterpart of the reference's ``src/PDE/`` layer (CGPDE.hpp, DGPDE.hpp and
the Transport/CompFlow/MultiMat systems), re-designed as pure, jit-safe
functions over dense element tables instead of value-semantic C++ classes
over per-element loops.
"""
