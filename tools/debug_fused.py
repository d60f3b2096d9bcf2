"""Localize fused-kernel vs XLA divergence: compare per-face contribR
and the final accumulation separately, on-chip, f32."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.dg import (
        build_dggeom, BC_SYMMETRY, BC_INTERIOR, uview, eval_basis_cm,
    )
    from quinoa_tpu.pde.dg_compflow import DGCompFlow
    from quinoa_tpu.pde.problems import SedovBlastwave
    from quinoa_tpu.ops.face_accum import build_accum_plan, accumulate_faces
    from quinoa_tpu.ops.face_fused import fused_face_pass

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    TF = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mesh = box_tet_mesh(n, n, n, hi=(1.0, 1.0, 1.0))
    bc = {i: BC_SYMMETRY for i in range(1, 7)}
    geom = build_dggeom(mesh, ndof=4, bc_sidesets=bc)
    system = DGCompFlow(SedovBlastwave(), riemann_flux="hllc")
    plan = build_accum_plan(geom, TF=TF, W=TF)

    E = geom.nelem
    C, K = 5, 4
    rng = np.random.default_rng(0)
    U0 = np.zeros((C * K, E), np.float32)
    U0[0 * K] = 1.0 + 0.05 * rng.random(E)
    U0[4 * K] = 2.5 + 0.05 * rng.random(E)
    U0[1 * K] = 0.1 * rng.random(E)
    for ck in range(C * K):
        if ck % K:
            U0[ck] = 0.01 * rng.random(E)
    U = jnp.asarray(U0)

    # ---- XLA reference face pass (same math as dg_rhs unfused) ----
    def xla_contribs(U):
        Uv = uview(U, C, K)
        interior = geom.bctype == BC_INTERIOR
        B_l = eval_basis_cm(K, geom.xi_l)
        B_r = eval_basis_cm(K, geom.xi_r)
        sL = jnp.einsum("kgf,ckf->cgf", B_l, Uv[:, :, geom.el], precision="highest")
        sR = jnp.einsum("kgf,ckf->cgf", B_r, Uv[:, :, geom.er], precision="highest")
        fnf = geom.fn[:, None, :]
        sR = jnp.where(interior, sR,
                       system.bc_state(geom.bctype, sL, fnf, None, 0.0))
        fl = system.riemann(fnf, sL, sR, None, 0.0)
        tb = geom.tables
        wt = jnp.asarray(tb["w_face"], dtype=U.dtype)[:, None] * (
            geom.farea * geom.fmask)
        contribL = -jnp.einsum("kgf,gf,cgf->ckf", B_l, wt, fl, precision="highest")
        contribR = jnp.einsum("kgf,gf,cgf->ckf", B_r, wt, fl, precision="highest")
        return contribL, contribR

    cL, cR = jax.jit(xla_contribs)(U)

    # fused pass final accumulation
    acc_fused = jax.jit(
        lambda u: fused_face_pass(system, geom, plan, u))(U)
    # XLA contribs + Pallas accumulation (the round-1 validated path)
    acc_mixed = jax.jit(
        lambda a, b: accumulate_faces(plan, a, b, C, K))(cL, cR)
    # XLA contribs + XLA fose accumulation
    Rv = jnp.zeros((C, K, E), dtype=U.dtype)
    for i in range(4):
        f = geom.fose[i]
        side = geom.fsideR[i]
        Rv = Rv + jnp.where(side > 0, cR[:, :, f], cL[:, :, f])
    acc_xla = np.asarray(Rv.reshape(C * K, E))

    am, af = np.asarray(acc_mixed), np.asarray(acc_fused)
    scale = np.abs(acc_xla).max()
    print("scale (max |acc|):", scale)
    print("mixed vs xla  :", np.abs(am - acc_xla).max() / scale)
    print("fused vs xla  :", np.abs(af - acc_xla).max() / scale)
    print("fused vs mixed:", np.abs(af - am).max() / scale)

    # weighted-flux comparison, per-face in geom (el-sorted) order
    # (_debug_contrib emits the kernel's (C*G, F) weighted flux)
    _, cR_k = jax.jit(
        lambda u: fused_face_pass(system, geom, plan, u,
                                  _debug_contrib=True))(U)
    def xla_wfl(U):
        from quinoa_tpu.pde.dg import uview, eval_basis_cm, BC_INTERIOR
        Uv = uview(U, C, K)
        interior = geom.bctype == BC_INTERIOR
        B_l = eval_basis_cm(K, geom.xi_l)
        B_r = eval_basis_cm(K, geom.xi_r)
        sL = jnp.einsum("kgf,ckf->cgf", B_l, Uv[:, :, geom.el],
                        precision="highest")
        sR = jnp.einsum("kgf,ckf->cgf", B_r, Uv[:, :, geom.er],
                        precision="highest")
        fnf = geom.fn[:, None, :]
        sR = jnp.where(interior, sR,
                       system.bc_state(geom.bctype, sL, fnf, None, 0.0))
        fl = system.riemann(fnf, sL, sR, None, 0.0)
        wt = jnp.asarray(geom.tables["w_face"], dtype=U.dtype)[:, None] * (
            geom.farea * geom.fmask)
        return (fl * wt[None]).reshape(-1, fl.shape[-1])
    cR_x = np.asarray(jax.jit(xla_wfl)(U))
    cR_k = np.asarray(cR_k)
    d = np.abs(cR_k - cR_x).max(axis=0)
    print("contrib scale:", float(np.abs(cR_x).max()))
    print("contribR max diff:", d.max())
    bad = np.where(d > 1e-6)[0]
    print("bad faces:", len(bad), "of", d.shape[0])
    if len(bad):
        el = np.asarray(geom.el)
        er = np.asarray(geom.er)
        bt = np.asarray(geom.bctype)
        TFv = plan.TF
        print("bad face idx sample:", bad[:10])
        print("  tiles:", np.unique(bad // TFv)[:20], "of", plan.ntileL)
        print("  pos-in-tile range:", (bad % TFv).min(), (bad % TFv).max())
        print("  bctype values:", np.unique(bt[bad]))
        print("  el==er (bnd):", int((el[bad] == er[bad]).sum()))
        f = bad[0]
        print("  face", f, "el", el[f], "er", er[f], "bt", bt[f])
        print("  kernel:", cR_k[:, f])
        print("  xla:   ", cR_x[:, f])


if __name__ == "__main__":
    main()
