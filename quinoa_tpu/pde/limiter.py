"""Slope limiters for DG(P1): WENO and Superbee.

Vectorized re-implementations of the reference's limiters
(src/PDE/Limiter.cpp: WENO_P1:29-152, Superbee_P1:154-317): the per-element
neighbor-stencil loops become gathers over the esuel table with -1
neighbors masked.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.basis import eval_basis


def weno_p1(geom, U, dofmask, cweight: float = 30.0):
    """WENO limiter on the three P1 dofs of every component.

    U : (E, C, K>=4).  Returns limited U.
    """
    E, C, K = U.shape
    esuel = geom.esuel  # (E,4), -1 on boundary
    nbr = jnp.where(esuel < 0, 0, esuel)  # safe gather index
    valid = (esuel >= 0).astype(U.dtype)  # (E,4)

    g0 = U[:, :, 1:4]  # (E,C,3) primary stencil
    gn = U[nbr][:, :, :, 1:4]  # (E,4,C,3) neighbor stencils

    grads = jnp.concatenate([g0[:, None], gn], axis=1)  # (E,5,C,3)
    wstencil = jnp.concatenate(
        [jnp.full((E, 1), cweight, dtype=U.dtype), valid], axis=1
    )  # (E,5)

    osc = jnp.sqrt((grads**2).sum(-1))  # (E,5,C)
    wt = wstencil[:, :, None] * (1.0e-8 + osc) ** -2
    wt = wt / wt.sum(axis=1, keepdims=True)

    lim = (wt[..., None] * grads).sum(axis=1)  # (E,C,3)
    Unew = U.at[:, :, 1:4].set(lim)
    return jnp.where(dofmask[:, None, :] > 0, Unew, U)


def superbee_p1(geom, U, dofmask, beta_lim: float = 2.0):
    """Superbee TVD limiter: scale P1 dofs by a per-element, per-component
    coefficient from min/max bounds over face neighbors evaluated at all
    face quadrature points (Limiter.cpp:154-317)."""
    E, C, K = U.shape
    esuel = geom.esuel
    nbr = jnp.where(esuel < 0, 0, esuel)
    valid = esuel >= 0  # (E,4)

    u0 = U[:, :, 0]  # (E,C) cell means
    un = U[nbr][:, :, :, 0]  # (E,4,C)
    big = jnp.asarray(jnp.finfo(U.dtype).max, dtype=U.dtype)
    umax = jnp.maximum(u0, jnp.where(valid[:, :, None], un, -big).max(axis=1))
    umin = jnp.minimum(u0, jnp.where(valid[:, :, None], un, big).min(axis=1))

    # evaluate own high-order solution at all 4*ng face Gauss points
    B = eval_basis(geom.ndof, geom.xi_selfface)  # (4,G,K)
    Ue = U * dofmask[:, None, :]
    state = jnp.einsum("eck,fgk->efgc", Ue, B)  # (E,4,G,C)

    uNeg = state - u0[:, None, None, :]
    eps = 1.0e-14
    phi_up = jnp.minimum(
        1.0, (umax - u0)[:, None, None, :] / (2.0 * jnp.where(uNeg > eps, uNeg, 1.0))
    )
    phi_dn = jnp.minimum(
        1.0, (umin - u0)[:, None, None, :] / (2.0 * jnp.where(uNeg < -eps, uNeg, 1.0))
    )
    phi_gp = jnp.where(
        uNeg > eps, phi_up, jnp.where(uNeg < -eps, phi_dn, 1.0)
    )
    phi_gp = jnp.maximum(
        0.0,
        jnp.maximum(
            jnp.minimum(beta_lim * phi_gp, 1.0), jnp.minimum(phi_gp, beta_lim)
        ),
    )
    phi = phi_gp.min(axis=(1, 2))  # (E,C)

    Unew = U.at[:, :, 1:4].multiply(phi[:, :, None])
    # only limit p1-active elements
    active = dofmask[:, 1] > 0
    return jnp.where(active[:, None, None], Unew, U)
