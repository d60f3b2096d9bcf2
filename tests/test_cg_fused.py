"""Fused DiagCG+FCT window kernels (ops/cg_fused.py) vs the XLA path.

The fused path runs the whole FCT stage chain (TG rhs + mass diffusion +
AEC/P, allowed extrema Q, limit + apply) as three Pallas window passes
with the element math INSIDE the kernels; these tests hold it to the XLA
formulation at machine precision, on both a locality-ordered mesh
(near-dominant) and a randomly relabeled one (far-stream heavy).
"""

import os

import numpy as np
import pytest

# full-solver parity runs (the same class as test_reference_parity);
# the env-gated fused paths are exercised here and in the on-chip queue
pytestmark = pytest.mark.slow


def _solvers(mesh, bcnodes, monkeypatch, W=None):
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver

    geom = make_cggeom(mesh)
    sys_ = CGTransport(SlotCyl())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = DiagCGSolver(sys_, geom, cfl=0.8, bcnodes=bcnodes)
    assert ref.fused_plan is None
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    if W is not None:
        monkeypatch.setenv("QUINOA_CGF_W", str(W))
    fus = DiagCGSolver(sys_, geom, cfl=0.8, bcnodes=bcnodes)
    assert fus.fused_plan is not None
    return ref, fus


def test_fused_cg_matches_xla_near(monkeypatch):
    """Locality-ordered mesh (the bench configuration): 5 FCT steps
    match the XLA path to machine precision."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    ref, fus = _solvers(mesh, mesh.all_bnodes(), monkeypatch)
    a = ref.nsteps(ref.initial_state(), 5)
    b = fus.nsteps(fus.initial_state(), 5)
    assert float(a.t) == float(b.t)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d < 1e-12, d


def test_fused_cg_matches_xla_far(monkeypatch):
    """Randomly relabeled nodes + a tiny window force a far-stream-heavy
    plan (>50% far slots): the compact far emit + target-sorted folds
    must still reproduce the XLA path exactly."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.unsmesh import UnsMesh

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    rng = np.random.default_rng(0)
    perm = rng.permutation(mesh.nnode)
    inv = np.argsort(perm)
    m2 = UnsMesh(coords=mesh.coords[inv], inpoel=perm[mesh.inpoel])
    bc = perm[np.asarray(mesh.all_bnodes())]
    ref, fus = _solvers(m2, bc, monkeypatch, W=128)
    assert fus.fused_plan.plan.nfar > 0.3 * fus.fused_plan.plan.S
    a = ref.nsteps(ref.initial_state(), 5)
    b = fus.nsteps(fus.initial_state(), 5)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d < 1e-12, d


def test_fused_plan_gating(monkeypatch):
    """Configurations the kernels can't serve fall back loudly: a
    diffusive system must not build a fused plan."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import ShearDiff
    from quinoa_tpu.inciter import DiagCGSolver

    mesh = box_tet_mesh(4, 4, 4)
    geom = make_cggeom(mesh)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    with pytest.warns(RuntimeWarning, match="doesn't qualify"):
        s = DiagCGSolver(CGTransport(ShearDiff()), geom, cfl=0.8)
    assert s.fused_plan is None


def test_fused_cg_spmd_matches_single(monkeypatch):
    """Stacked per-shard fused plans under shard_map (forced-uniform
    dims, one compiled program for all devices): 4 steps at 2 and 4
    shards match the single-device XLA path at machine precision on
    owned nodes — the three exchanges ([rhs|dif|P+|P-] sum, Q max,
    A sum) replace the XLA path's four."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver
    from quinoa_tpu.parallel.shard import build_cg_shards
    from quinoa_tpu.parallel.spmd import SPMDDiagCGSolver

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    sys_ = CGTransport(SlotCyl())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = DiagCGSolver(sys_, make_cggeom(mesh), cfl=0.8,
                       bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 4)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    for S in (2, 4):
        sh = build_cg_shards(mesh, S, 1,
                             bcnodes=np.asarray(mesh.all_bnodes()))
        dmesh = Mesh(np.array(jax.devices()[:S]), ("shard",))
        sol = SPMDDiagCGSolver(sys_, sh, dmesh, cfl=0.8)
        assert sol.fused_plan is not None
        b = sol.nsteps(sol.initial_state(), 4)
        ug = np.zeros((1, mesh.nnode))
        gids = np.asarray(sh.gids)
        owned = np.asarray(sh.owned)
        ub = np.asarray(b.u)
        for s in range(S):
            m = (owned[s] > 0) & (gids[s] >= 0)
            ug[:, gids[s][m]] = ub[s][:, m]
        d = np.abs(ug - np.asarray(a.u)).max()
        assert d < 1e-12, (S, d)


def test_fused_cg_spmd_far_heavy(monkeypatch):
    """Randomly relabeled nodes under shard_map: per-shard plans carry
    UNEQUAL nonzero far-slot counts (the reviewer-found stacking crash)
    and the compact far streams must still reproduce the single-device
    XLA path."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.unsmesh import UnsMesh
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver
    from quinoa_tpu.parallel.shard import build_cg_shards
    from quinoa_tpu.parallel.spmd import SPMDDiagCGSolver

    mesh = box_tet_mesh(10, 10, 5, hi=(1.0, 1.0, 0.5))
    rng = np.random.default_rng(3)
    perm = rng.permutation(mesh.nnode)
    inv = np.argsort(perm)
    m2 = UnsMesh(coords=mesh.coords[inv], inpoel=perm[mesh.inpoel])
    bc = perm[np.asarray(mesh.all_bnodes())]
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = DiagCGSolver(CGTransport(SlotCyl()), make_cggeom(m2),
                       cfl=0.8, bcnodes=bc)
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    monkeypatch.setenv("QUINOA_CGF_W", "128")
    sh = build_cg_shards(m2, 2, 1, bcnodes=bc)
    dmesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sol = SPMDDiagCGSolver(CGTransport(SlotCyl()), sh, dmesh, cfl=0.8)
    assert sol.fused_plan is not None
    b = sol.nsteps(sol.initial_state(), 3)
    ug = np.zeros((1, m2.nnode))
    gids = np.asarray(sh.gids)
    owned = np.asarray(sh.owned)
    ub = np.asarray(b.u)
    for s in range(2):
        m = (owned[s] > 0) & (gids[s] >= 0)
        ug[:, gids[s][m]] = ub[s][:, m]
    d = np.abs(ug - np.asarray(a.u)).max()
    assert d < 1e-12, d


def test_fused_cg_multicomponent(monkeypatch):
    """C=2 transport (SlotCyl's multi-phase rotation): the kernels' C
    loops (stat row indexing, 4C/2C stacked assemblies, per-component
    limit coefficients) against the XLA path."""
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.mesh.reorder import (first_touch_node_reorder,
                                         hilbert_element_reorder)
    from quinoa_tpu.pde.cg import CGTransport, make_cggeom
    from quinoa_tpu.pde.problems import SlotCyl
    from quinoa_tpu.inciter import DiagCGSolver

    mesh = box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))
    mesh, _ = hilbert_element_reorder(mesh)
    mesh, _ = first_touch_node_reorder(mesh)
    geom = make_cggeom(mesh)
    sys_ = CGTransport(SlotCyl(ncomp=2))
    assert sys_.ncomp == 2
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = DiagCGSolver(sys_, geom, cfl=0.8, bcnodes=mesh.all_bnodes())
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    fus = DiagCGSolver(sys_, geom, cfl=0.8, bcnodes=mesh.all_bnodes())
    assert fus.fused_plan is not None and fus.fused_plan.C == 2
    a = ref.nsteps(ref.initial_state(), 4)
    b = fus.nsteps(fus.initial_state(), 4)
    d = np.abs(np.asarray(a.u) - np.asarray(b.u)).max()
    assert d < 1e-12, d


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


def test_fused_cg_compflow_matches_xla(monkeypatch):
    """Compflow K1 (Euler flux + EoS + manufactured source traced
    IN-kernel at the baked-in element coordinates) on the reference's
    VorticalFlow DiagCG config: 5 steps vs the XLA path at machine
    precision."""
    from quinoa_tpu.control.config import load_inciter, build_inciter
    from quinoa_tpu.io.exodus import read_exodus

    base = ("/root/reference/tests/regression/inciter/compflow/Euler/"
            "VorticalFlow/")
    gh = ("/root/reference/tests/regression/inciter/transport/"
          "GaussHump/")
    cfg = load_inciter(open(base + "vortical_flow_diagcg.q").read())
    mesh = read_exodus(gh + "unitcube_1k.exo")
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref, _ = build_inciter(cfg, mesh)
    s = ref.initial_state()
    for _ in range(5):
        s = ref.step(s)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    fus, _ = build_inciter(cfg, mesh)
    assert fus.fused_plan is not None
    assert fus.fused_plan.kind == "compflow"
    s2 = fus.initial_state()
    for _ in range(5):
        s2 = fus.step(s2)
    d = np.abs(np.asarray(s.u) - np.asarray(s2.u)).max()
    assert d / np.abs(np.asarray(s.u)).max() < 1e-12, d


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


def test_fused_cg_compflow_spmd_matches_single(monkeypatch):
    """Sharded compflow fused CG (the stacked builders must dispatch the
    compflow flavor BEFORE the velocity-probe gate): 3 steps at 2 shards
    on VorticalFlow DiagCG vs the single-device XLA path."""
    import jax
    from jax.sharding import Mesh

    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.pde.cg import make_cggeom
    from quinoa_tpu.pde.cg_compflow import CGCompFlow
    from quinoa_tpu.pde.problems import VorticalFlow
    from quinoa_tpu.inciter import DiagCGSolver
    from quinoa_tpu.parallel.shard import build_cg_shards
    from quinoa_tpu.parallel.spmd import SPMDDiagCGSolver

    mesh = box_tet_mesh(8, 8, 8, lo=(-0.5, -0.5, -0.5),
                        hi=(0.5, 0.5, 0.5))
    sys_ = CGCompFlow(VorticalFlow())
    monkeypatch.delenv("QUINOA_CG_FUSED", raising=False)
    ref = DiagCGSolver(sys_, make_cggeom(mesh), cfl=0.3,
                       bcnodes=mesh.all_bnodes())
    a = ref.nsteps(ref.initial_state(), 3)
    monkeypatch.setenv("QUINOA_CG_FUSED", "1")
    sh = build_cg_shards(mesh, 2, 5,
                         bcnodes=np.asarray(mesh.all_bnodes()))
    dmesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    sol = SPMDDiagCGSolver(sys_, sh, dmesh, cfl=0.3)
    assert sol.fused_plan is not None
    assert sol.fused_plan.kind == "compflow"
    b = sol.nsteps(sol.initial_state(), 3)
    ug = np.zeros((5, mesh.nnode))
    gids = np.asarray(sh.gids)
    owned = np.asarray(sh.owned)
    ub = np.asarray(b.u)
    for s in range(2):
        m = (owned[s] > 0) & (gids[s] >= 0)
        ug[:, gids[s][m]] = ub[s][:, m]
    d = np.abs(ug - np.asarray(a.u)).max()
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
