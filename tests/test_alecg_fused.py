"""Fused ALECG window kernels (ops/alecg_fused.py) vs the XLA path.

The fused path runs each RK stage's rhs as one element-window volume
kernel + one edge-window dissipation kernel (shared scaffolding in
ops/window_kernels.py) with the entity math INSIDE the kernels; these
tests hold it to the XLA formulation at machine precision, on both a
locality-ordered mesh (near-dominant) and a randomly relabeled one
(far-stream heavy), for transport and compflow, single-shard and
sharded.  (The DiagCG fused megakernel was removed after permanently
losing its silicon A/B — PERFORMANCE.md "DiagCG + FCT".)
"""

import os

import numpy as np
import pytest

# full-solver parity runs (the same class as test_reference_parity);
# the env-gated fused paths are exercised here and in the on-chip queue
pytestmark = pytest.mark.slow


def test_fused_plan_gating(monkeypatch):
    """Configurations the kernels can't serve fall back loudly under an
    EXPLICIT opt-in: a diffusive system must not build a fused ALECG
    plan."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport
    from quinoa_tpu.pde.problems import ShearDiff
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(4, 4, 4)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    with pytest.warns(RuntimeWarning, match="doesn't qualify"):
        s = make_alecg(CGTransport(ShearDiff()), mesh, cfl=0.8)
    assert s.fused_plan is None


def test_fused_alecg_matches_xla(monkeypatch):
    """Fused ALECG stage rhs (volume kernel + edge-dissipation kernel,
    static flux velocities and A*lambda weights): 4 RK3 steps match the
    XLA edge/element path at machine precision."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg import CGTransport
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    sys_ = CGTransport(SlotCyl())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = make_alecg(sys_, mesh, cfl=0.8, bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 4)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    fus = make_alecg(sys_, mesh, cfl=0.8, bcnodes=mesh.all_bnodes())
    assert fus.fused_plan is not None
    b = fus.nsteps(fus.initial_state(), 4)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d < 1e-12, d


def test_fused_alecg_far_heavy(monkeypatch):
    """Random node relabeling + tiny window: the edge plan's far stream
    (2-slot entities) must reproduce the XLA path too."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.unsmesh import UnsMesh
    from quinoa_tpu.pde.cg import CGTransport
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    rng = np.random.default_rng(5)
    perm = rng.permutation(mesh.nnode)
    inv = np.argsort(perm)
    m2 = UnsMesh(coords=mesh.coords[inv], inpoel=perm[mesh.inpoel])
    bc = perm[np.asarray(mesh.all_bnodes())]
    sys_ = CGTransport(SlotCyl())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = make_alecg(sys_, m2, cfl=0.8, bcnodes=bc)
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    monkeypatch.setenv("QUINOA_CGF_W", "128")
    fus = make_alecg(sys_, m2, cfl=0.8, bcnodes=bc)
    assert fus.fused_plan is not None
    assert fus.fused_plan.dplan.nfar > 0
    b = fus.nsteps(fus.initial_state(), 3)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d < 1e-12, d


def test_fused_alecg_spmd_matches_single(monkeypatch):
    """Stacked fused ALECG plans under shard_map (element + edge window
    kernels per shard, one sum combine per RK stage): 3 steps at 2
    shards match the single-device XLA path at machine precision."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg import CGTransport
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter.alecg import make_alecg
    from quinoa_tpu.parallel.alecg_spmd import (build_alecg_shards,
                                                SPMDALECGSolver)

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    sys_ = CGTransport(SlotCyl())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = make_alecg(sys_, mesh, cfl=0.8, bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    sh = build_alecg_shards(mesh, 2, 1,
                            bcnodes=np.asarray(mesh.all_bnodes()))
    dmesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sol = SPMDALECGSolver(sys_, sh, dmesh, cfl=0.8)
    assert sol.fused_plan is not None
    b = sol.nsteps(sol.initial_state(), 3)
    ug = np.zeros((1, mesh.nnode))
    gids = np.asarray(sh.cg.gids)
    owned = np.asarray(sh.cg.owned)
    ub = np.asarray(b.u)
    for s in range(2):
        m = (owned[s] > 0) & (gids[s] >= 0)
        ug[:, gids[s][m]] = ub[s][:, m]
    d = np.abs(ug - np.asarray(a.u)).max()
    assert d < 1e-12, d


def test_fused_alecg_compflow_matches_xla(monkeypatch):
    """Compflow ALECG kernels (Euler flux + edge charspeed traced
    in-kernel, rho-safe pad blending): 3 RK3 steps on VorticalFlow vs
    the XLA path at machine precision."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg_compflow import CGCompFlow
    from quinoa_tpu.pde.problems import VorticalFlow
    from quinoa_tpu.inciter.alecg import make_alecg

    mesh = box_tet_mesh(8, 8, 8, lo=(-0.5, -0.5, -0.5),
                        hi=(0.5, 0.5, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    sys_ = CGCompFlow(VorticalFlow())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = make_alecg(sys_, mesh, cfl=0.6, bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    fus = make_alecg(sys_, mesh, cfl=0.6, bcnodes=mesh.all_bnodes())
    assert fus.fused_plan is not None
    assert fus.fused_plan.kind == "compflow"
    b = fus.nsteps(fus.initial_state(), 3)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d / np.abs(np.asarray(a.u)).max() < 1e-12, d


def test_fused_alecg_compflow_spmd_matches_single(monkeypatch):
    """Sharded compflow fused ALECG: 3 steps at 2 shards on VorticalFlow
    vs the single-device XLA path."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg_compflow import CGCompFlow
    from quinoa_tpu.pde.problems import VorticalFlow
    from quinoa_tpu.inciter.alecg import make_alecg
    from quinoa_tpu.parallel.alecg_spmd import (build_alecg_shards,
                                                SPMDALECGSolver)

    mesh = box_tet_mesh(8, 8, 8, lo=(-0.5, -0.5, -0.5),
                        hi=(0.5, 0.5, 0.5))
    sys_ = CGCompFlow(VorticalFlow())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = make_alecg(sys_, mesh, cfl=0.6, bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    sh = build_alecg_shards(mesh, 2, 5,
                            bcnodes=np.asarray(mesh.all_bnodes()))
    dmesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sol = SPMDALECGSolver(sys_, sh, dmesh, cfl=0.6)
    assert sol.fused_plan is not None
    assert sol.fused_plan.kind == "compflow"
    b = sol.nsteps(sol.initial_state(), 3)
    ug = np.zeros((5, mesh.nnode))
    gids = np.asarray(sh.cg.gids)
    owned = np.asarray(sh.cg.owned)
    ub = np.asarray(b.u)
    for s in range(2):
        m = (owned[s] > 0) & (gids[s] >= 0)
        ug[:, gids[s][m]] = ub[s][:, m]
    d = np.abs(ug - np.asarray(a.u)).max()
    assert d / np.abs(np.asarray(a.u)).max() < 1e-12, d
