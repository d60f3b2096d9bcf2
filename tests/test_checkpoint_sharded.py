"""Per-shard checkpoint/restart on the virtual 8-device mesh.

The reference's Charm++ double checkpoint writes one file per chare and
restarts without assembling a global state (CkStartCheckpoint,
Transporter.cpp:951-976); here each shard of the SPMD state is written
to its own npz and restart re-places shard files directly onto the
device mesh (no host-0 global buffer).
"""

import dataclasses

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from quinoa_tpu.inciter.checkpoint import (
    save_checkpoint_sharded, load_checkpoint_sharded,
)
from quinoa_tpu.mesh import box_tet_mesh
from quinoa_tpu.pde.cg import CGTransport
from quinoa_tpu.pde.problems import SlotCyl
from quinoa_tpu.parallel import build_cg_shards, SPMDDiagCGSolver


@pytest.fixture(scope="module")
def spmd_solver():
    mesh = box_tet_mesh(8, 8, 4, hi=(1.0, 1.0, 0.5))
    sharded = build_cg_shards(mesh, 8, ncomp=1, bcnodes=mesh.all_bnodes())
    dmesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    return SPMDDiagCGSolver(CGTransport(SlotCyl()), sharded, dmesh, cfl=0.5)


def test_sharded_checkpoint_files_and_roundtrip(tmp_path, spmd_solver):
    solver = spmd_solver
    s = solver.nsteps(solver.initial_state(), 3)
    ck = str(tmp_path / "restart")
    save_checkpoint_sharded(ck, s, {"it": int(np.asarray(s.it).ravel()[0])})

    # one npz per shard, none of them global-sized
    slot = tmp_path / "restart" / "slot0"
    shardfiles = sorted(slot.glob("shard*.npz"))
    assert len(shardfiles) == 8
    u = np.asarray(s.u)
    for f in shardfiles:
        blk = np.load(f)["u"]
        assert blk.shape == (1,) + u.shape[1:]

    s2, meta = load_checkpoint_sharded(ck, type(s), mesh=solver.mesh)
    assert meta["it"] == 3
    np.testing.assert_array_equal(np.asarray(s2.u), u)
    # restart state is already placed shard-per-device
    assert len(s2.u.sharding.device_set) == 8


def test_sharded_chained_restart(tmp_path, spmd_solver):
    """run 2 -> ckpt -> run 2 -> ckpt (other slot) -> restart == straight
    6-step run, on the 8-device mesh."""
    solver = spmd_solver
    ck = str(tmp_path / "restart")

    s = solver.nsteps(solver.initial_state(), 2)
    save_checkpoint_sharded(ck, s, {"it": int(np.asarray(s.it).ravel()[0])})
    s = solver.nsteps(s, 2)
    save_checkpoint_sharded(ck, s, {"it": int(np.asarray(s.it).ravel()[0])})

    s2, meta = load_checkpoint_sharded(ck, type(s), mesh=solver.mesh)
    assert meta["it"] == 4
    s2 = solver.nsteps(s2, 2)

    ref = solver.nsteps(solver.initial_state(), 6)
    np.testing.assert_allclose(
        np.asarray(s2.u), np.asarray(ref.u), rtol=1e-12, atol=1e-15
    )
    assert np.asarray(s2.it).ravel()[0] == 6


def test_sharded_checkpoint_slot_fallback(tmp_path, spmd_solver):
    """A corrupt newest slot falls back to the older intact one."""
    solver = spmd_solver
    ck = str(tmp_path / "restart")
    s = solver.nsteps(solver.initial_state(), 1)
    save_checkpoint_sharded(ck, s, {"it": 1})
    s = solver.nsteps(s, 1)
    save_checkpoint_sharded(ck, s, {"it": 2})
    # corrupt the newest slot (seq=1 -> slot1)
    (tmp_path / "restart" / "slot1" / "shard3.npz").write_bytes(b"garbage")
    s2, meta = load_checkpoint_sharded(ck, type(s), mesh=solver.mesh)
    assert meta["it"] == 1
