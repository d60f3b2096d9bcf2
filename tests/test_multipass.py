"""Property tests for the multi-pass AMR intermediates machine.

amr/multipass.py is parity-tested against the committed t0ref baselines
(test_reference_parity); these are structural invariants under random
tag sequences — the properties any sequence of reference-semantics
passes must preserve:

- volume partition: total mesh volume is conserved by every pass;
- conformity: every interior face is shared by exactly two elements,
  every boundary-triangle matches an element face;
- node identity: no two nodes share coordinates;
- group invariants: live partial groups are 1:2 pairs / 1:4 quads whose
  midpoints are real edge midpoints of their parents.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from quinoa_tpu.mesh import box_tet_mesh  # noqa: E402
from quinoa_tpu.mesh.derived import gen_inpoed  # noqa: E402
from quinoa_tpu.amr.multipass import AMRState, refine_pass  # noqa: E402


def _vol(mesh):
    x = np.asarray(mesh.coords)[np.asarray(mesh.inpoel)]
    a = x[:, 0]
    j = np.einsum("ij,ij->i",
                  np.cross(x[:, 1] - a, x[:, 2] - a), x[:, 3] - a)
    assert (j > 0).all(), "inverted element"
    return j.sum() / 6.0


def _check_conforming(mesh):
    inpoel = np.asarray(mesh.inpoel, np.int64)
    faces = np.concatenate([
        np.sort(inpoel[:, c], axis=1)
        for c in ([0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3])
    ])
    _, counts = np.unique(faces, axis=0, return_counts=True)
    assert counts.max() <= 2, "face shared by >2 elements (non-conforming)"
    nbnd = int((counts == 1).sum())
    ntris = sum(len(t) for t in mesh.bface.values())
    assert ntris == nbnd, (ntris, nbnd)
    # every bface triangle IS an element face
    fset = {tuple(f) for f in faces[np.repeat(counts == 1,
                                              1)].tolist()} if False else \
        {tuple(f) for f in faces.tolist()}
    for tris in mesh.bface.values():
        for t in np.sort(np.asarray(tris, np.int64), axis=1).tolist():
            assert tuple(t) in fset


def _check_nodes_unique(mesh):
    c = np.round(np.asarray(mesh.coords), 12)
    assert len(np.unique(c, axis=0)) == mesh.nnode, "duplicate nodes"


def _check_groups(mesh, state):
    inpoel = np.asarray(mesh.inpoel, np.int64)
    coords = np.asarray(mesh.coords)
    for g in state.groups:
        assert g.kind in (2, 4) and len(g.children) == g.kind
        # children rows exist and use only parent nodes + midpoints
        allowed = set(g.parent.tolist()) | set(g.mids.tolist())
        for ch in g.children:
            assert set(inpoel[ch].tolist()) <= allowed
        # midpoints are true edge midpoints of the parent
        for (a, b), m in zip(g.mid_pairs.tolist(), g.mids.tolist()):
            np.testing.assert_allclose(
                coords[m], 0.5 * (coords[a] + coords[b]), atol=0)


def _random_tags(rng, mesh, frac):
    edges = gen_inpoed(mesh.inpoel).astype(np.int64)
    n = max(1, int(frac * len(edges)))
    return edges[rng.choice(len(edges), size=n, replace=False)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_multipass_invariants_random_sequences(seed):
    rng = np.random.default_rng(seed)
    mesh = box_tet_mesh(3, 3, 3)
    v0 = _vol(mesh)
    state = AMRState()
    for frac in (0.05, 0.08, 0.05):
        tags = _random_tags(rng, mesh, frac)
        mesh, rmap, state = refine_pass(mesh, tags, state)
        np.testing.assert_allclose(_vol(mesh), v0, rtol=1e-12)
        _check_conforming(mesh)
        _check_nodes_unique(mesh)
        _check_groups(mesh, state)


def test_multipass_uniform_over_partials_rebuilds_groups():
    """A uniform pass over a mesh with live partial groups rebuilds
    every EXISTING group through its parent (2:8/4:8, Algorithm 3) —
    none of the old groups survive.  New partial groups DO appear (the
    reference behaves the same: a 1:8 neighbor that carries another
    group's intermediate edges goes class 2 and can only split
    partially), which is exactly how ic_uniform's committed baseline
    mesh is reproduced bit-exactly in test_reference_parity."""
    rng = np.random.default_rng(7)
    mesh = box_tet_mesh(3, 3, 3)
    state = AMRState()
    tags = _random_tags(rng, mesh, 0.06)
    m1, _, state = refine_pass(mesh, tags, state)
    assert state.groups, "tag fraction produced no partial templates"
    old_parents = {tuple(sorted(g.parent.tolist())) for g in state.groups}
    m2, _, state2 = refine_pass(
        m1, gen_inpoed(m1.inpoel).astype(np.int64), state)
    new_parents = {tuple(sorted(g.parent.tolist()))
                   for g in state2.groups}
    assert not (old_parents & new_parents), "old group survived uniform"
    # rebuilt parents' original split edges no longer exist as edges
    edges2 = {tuple(e) for e in
              np.sort(gen_inpoed(m2.inpoel), axis=1).tolist()}
    for g in state.groups:
        for a, b in np.sort(g.mid_pairs, axis=1).tolist():
            assert (a, b) not in edges2
    _check_conforming(m2)
    _check_nodes_unique(m2)
    np.testing.assert_allclose(_vol(m2), _vol(mesh), rtol=1e-12)
