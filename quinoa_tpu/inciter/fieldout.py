"""Plot-variable derivation with the reference's output names.

Counterpart of the reference's per-PDE fieldOutput/names methods
(src/PDE/CompFlow/CGCompFlow.hpp fieldNames/fieldOutput, DGCompFlow,
DGMultiMat, Transport problem field names): raw conserved components are
converted to the primitive plot variables the reference writes, with
identical variable names, so exodiff-style comparisons against reference
baselines work name-for-name:

  transport : c{i}_numerical, c{i}_analytic, c{i}_error
  compflow  : density, x/y/z-velocity, specific_total_energy, pressure
              (_numerical, plus _analytical on CG nodal output)
  multimat  : volfrac{k}, density, x/y/z-velocity, pressure,
              total_energy_density (_numerical)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _compflow_prims(eos, u):
    rho = u[0]
    vel = [u[1] / rho, u[2] / rho, u[3] / rho]
    E = u[4] / rho
    import jax.numpy as jnp

    p = np.asarray(eos.pressure_cons_cm(jnp.asarray(u)))
    return rho, vel, E, p


def plot_fields(pde: str, system, u: np.ndarray, xyz: np.ndarray,
                t: float, analytic: bool = True,
                exact_mean: np.ndarray | None = None
                ) -> Dict[str, np.ndarray]:
    """Named plot variables from component-major data u (C, n).

    xyz : (3, n) sample points (nodes for CG output, cell centroids for
    DG) used to evaluate the analytic solution when the problem has one.
    exact_mean : optional (C, n) quadrature cell means of the analytic
    solution used for the error variable (num - exact cell mean), while
    the analytic variable is the centroid sample.  Note: the reference's
    committed c0_error (gauss_hump_dgp1.std.exo) stays ~1e-9 from its own
    numerical field even after 50 advection steps, which no comparison
    against the true solution reproduces (num - exact mean is ~5e-3
    there); we output the honest error instead.
    """
    import jax.numpy as jnp

    out: Dict[str, np.ndarray] = {}
    if pde == "transport":
        sol = None
        if analytic and hasattr(system.problem, "solution"):
            sol = np.asarray(system.problem.solution(jnp.asarray(xyz), t))
        for c in range(u.shape[0]):
            out[f"c{c}_numerical"] = u[c]
            if sol is not None:
                out[f"c{c}_analytic"] = sol[c]
                ref = exact_mean[c] if exact_mean is not None else sol[c]
                out[f"c{c}_error"] = u[c] - ref
        return out

    if pde == "compflow":
        rho, vel, E, p = _compflow_prims(system.eos, u)
        out["density_numerical"] = rho
        for i, nm in enumerate(("x-velocity", "y-velocity", "z-velocity")):
            out[f"{nm}_numerical"] = vel[i]
        out["specific_total_energy_numerical"] = E
        out["pressure_numerical"] = p
        if analytic and hasattr(system.problem, "solution"):
            ua = np.asarray(system.problem.solution(jnp.asarray(xyz), t))
            rho, vel, E, p = _compflow_prims(system.eos, ua)
            out["density_analytical"] = rho
            for i, nm in enumerate(("x-velocity", "y-velocity",
                                    "z-velocity")):
                out[f"{nm}_analytical"] = vel[i]
            out["specific_total_energy_analytical"] = E
            out["pressure_analytical"] = p
        return out

    if pde == "multimat":
        from ..pde.multimat import (
            volfrac_idx, density_idx, momentum_idx, energy_idx,
        )

        nmat = system.nmat
        rho = sum(u[density_idx(nmat, k)] for k in range(nmat))
        vel = [u[momentum_idx(nmat, i)] / rho for i in range(3)]
        ke = 0.5 * (vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2)
        p = np.zeros_like(rho)
        for k in range(nmat):
            a = u[volfrac_idx(nmat, k)]
            rk = u[density_idx(nmat, k)] / a
            ek = u[energy_idx(nmat, k)] / a
            pk = np.asarray(system.eos[k].pressure(
                jnp.asarray(rk), jnp.asarray(vel[0]), jnp.asarray(vel[1]),
                jnp.asarray(vel[2]), jnp.asarray(ek)))
            out[f"volfrac{k + 1}_numerical"] = a
            p = p + a * pk
        out["density_numerical"] = rho
        for i, nm in enumerate(("x-velocity", "y-velocity", "z-velocity")):
            out[f"{nm}_numerical"] = vel[i]
        out["pressure_numerical"] = p
        out["total_energy_density_numerical"] = sum(
            u[energy_idx(nmat, k)] for k in range(nmat)
        )
        return out

    raise ValueError(f"unknown pde {pde!r}")
