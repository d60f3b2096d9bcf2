"""Checkpoint / restart.

Counterpart of the reference's Charm++ double checkpoint
(CkStartCheckpoint every rsfreq steps + `+restart <dir>` resume,
src/Inciter/Transporter.cpp:951-976, SURVEY.md §5.4): here the state
pytree (solution, time, iteration, dt, p-adaptive dofs) plus run metadata
is written atomically to a directory; restart loads it back into a
freshly-built solver — the mesh/geometry is rebuilt from the original
inputs (the reference re-parses the cmdline and rebuilds factories on
restart the same way, Main/Inciter.cpp:213-234).

Two alternating snapshot slots mirror the reference's double checkpoint:
a crash while writing one slot leaves the other intact.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
import zipfile
from typing import Any, Dict, Optional

import numpy as np


def save_checkpoint(dirpath: str, state, meta: Optional[Dict[str, Any]] = None):
    """Write state into the next of two alternating slots (atomic rename)."""
    os.makedirs(dirpath, exist_ok=True)
    seq = 0
    seqfile = os.path.join(dirpath, "latest")
    if os.path.exists(seqfile):
        seq = int(open(seqfile).read().strip()) + 1
    slot = os.path.join(dirpath, f"slot{seq % 2}")
    os.makedirs(slot, exist_ok=True)

    arrays = {}
    fields = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        arrays[f.name] = np.asarray(v)
        fields[f.name] = True

    tmp = tempfile.NamedTemporaryFile(
        dir=slot, suffix=".npz", delete=False
    )
    np.savez(tmp, **arrays)
    tmp.close()
    os.replace(tmp.name, os.path.join(slot, "state.npz"))
    with open(os.path.join(slot, "meta.json"), "w") as fh:
        json.dump({"seq": seq, "fields": list(fields), **(meta or {})}, fh)
    with open(seqfile + ".tmp", "w") as fh:
        fh.write(str(seq))
    os.replace(seqfile + ".tmp", seqfile)
    return slot


def _next_slot(dirpath: str):
    os.makedirs(dirpath, exist_ok=True)
    seq = 0
    seqfile = os.path.join(dirpath, "latest")
    if os.path.exists(seqfile):
        seq = int(open(seqfile).read().strip()) + 1
    slot = os.path.join(dirpath, f"slot{seq % 2}")
    os.makedirs(slot, exist_ok=True)
    return seq, seqfile, slot


def _commit_slot(seq: int, seqfile: str):
    with open(seqfile + ".tmp", "w") as fh:
        fh.write(str(seq))
    os.replace(seqfile + ".tmp", seqfile)


def save_checkpoint_sharded(dirpath: str, state,
                            meta: Optional[Dict[str, Any]] = None):
    """Per-shard double checkpoint: one npz per shard, no host-0 gather.

    Sharded fields (leading shard axis under a 1-D jax sharding) are
    written per addressable shard into `shard<k>.npz` — the analog of the
    reference's per-chare checkpoint files (Charm++ CkStartCheckpoint
    writes one file per chare; restart naming Discretization.hpp:280-283).
    On multi-host deployments each host writes only its own shards.
    Scalar/replicated fields go into `state.npz`.
    """
    import jax

    seq, seqfile, slot = _next_slot(dirpath)

    scalars = {}
    sharded: Dict[int, Dict[str, np.ndarray]] = {}
    nshard = 0
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        shards = getattr(v, "addressable_shards", None)
        if shards is not None and getattr(v, "ndim", 0) >= 1 \
                and len(shards) > 1:
            blk = v.shape[0] // len(v.sharding.device_set)
            nshard = max(nshard, len(shards))
            for sh in shards:
                k = (sh.index[0].start or 0) // blk
                sharded.setdefault(k, {})[f.name] = np.asarray(sh.data)
        else:
            scalars[f.name] = np.asarray(v)

    for k, arrays in sharded.items():
        tmp = tempfile.NamedTemporaryFile(dir=slot, suffix=".npz",
                                          delete=False)
        np.savez(tmp, **arrays)
        tmp.close()
        os.replace(tmp.name, os.path.join(slot, f"shard{k}.npz"))
    tmp = tempfile.NamedTemporaryFile(dir=slot, suffix=".npz", delete=False)
    np.savez(tmp, **scalars)
    tmp.close()
    os.replace(tmp.name, os.path.join(slot, "state.npz"))

    manifest = {
        "seq": seq,
        "fields": [f.name for f in dataclasses.fields(state)],
        "scalar_fields": sorted(scalars),
        "sharded_fields": sorted(
            {n for d in sharded.values() for n in d}
        ),
        "nshard": nshard,
        **(meta or {}),
    }
    with open(os.path.join(slot, "meta.json"), "w") as fh:
        json.dump(manifest, fh)
    _commit_slot(seq, seqfile)
    return slot


def load_checkpoint_sharded(dirpath: str, state_cls, mesh=None,
                            axis: str = "shard"):
    """Load the newest complete per-shard snapshot; returns (state, meta).

    With a jax.sharding.Mesh, sharded fields are assembled directly onto
    the devices shard-by-shard (jax.make_array_from_single_device_arrays
    — no global host buffer); without one they are concatenated on host.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    seqfile = os.path.join(dirpath, "latest")
    if not os.path.exists(seqfile):
        raise FileNotFoundError(f"no checkpoint in {dirpath}")
    seq = int(open(seqfile).read().strip())
    for trial in (seq, seq - 1):
        if trial < 0:
            break
        slot = os.path.join(dirpath, f"slot{trial % 2}")
        try:
            meta = json.load(open(os.path.join(slot, "meta.json")))
            if meta["seq"] != trial:
                continue
            scal = np.load(os.path.join(slot, "state.npz"))
            kwargs = {k: jnp.asarray(scal[k]) for k in meta["scalar_fields"]}
            ns = meta["nshard"]
            if mesh is not None and ns % mesh.devices.size != 0:
                # a mismatched --npes would silently mis-assemble the
                # blocks (per_dev = 0 or wrong blocking) — fail loudly
                # (RuntimeError: NOT caught by the slot-fallback except)
                raise RuntimeError(
                    f"checkpoint in {dirpath} holds {ns} shards, which "
                    f"cannot be distributed over {mesh.devices.size} "
                    "devices; restart with a device count that divides "
                    "the checkpoint's shard count"
                )
            shards = [
                np.load(os.path.join(slot, f"shard{k}.npz"))
                for k in range(ns)
            ]
            for name in meta["sharded_fields"]:
                blocks = [shards[k][name] for k in range(ns)]
                if mesh is not None:
                    sharding = NamedSharding(mesh, P(axis))
                    devs = mesh.devices.reshape(-1)
                    per_dev = ns // len(devs)
                    arrs = [
                        jax.device_put(
                            np.concatenate(
                                blocks[i * per_dev:(i + 1) * per_dev]
                            ),
                            d,
                        )
                        for i, d in enumerate(devs)
                    ]
                    full = (blocks[0].shape[0] * ns,) + blocks[0].shape[1:]
                    kwargs[name] = jax.make_array_from_single_device_arrays(
                        full, sharding, arrs
                    )
                else:
                    kwargs[name] = jnp.asarray(np.concatenate(blocks))
            return state_cls(**kwargs), meta
        except (OSError, ValueError, KeyError, zipfile.BadZipFile):
            continue
    raise IOError(f"no readable checkpoint slot in {dirpath}")


def load_checkpoint(dirpath: str, state_cls):
    """Load the newest complete snapshot; returns (state, meta)."""
    import jax.numpy as jnp

    seqfile = os.path.join(dirpath, "latest")
    if not os.path.exists(seqfile):
        raise FileNotFoundError(f"no checkpoint in {dirpath}")
    seq = int(open(seqfile).read().strip())
    for trial in (seq, seq - 1):
        if trial < 0:
            break
        slot = os.path.join(dirpath, f"slot{trial % 2}")
        try:
            meta = json.load(open(os.path.join(slot, "meta.json")))
            if meta["seq"] != trial:
                continue
            data = np.load(os.path.join(slot, "state.npz"))
            kwargs = {k: jnp.asarray(data[k]) for k in meta["fields"]}
            return state_cls(**kwargs), meta
        except (OSError, ValueError, KeyError, zipfile.BadZipFile):
            continue
    raise IOError(f"no readable checkpoint slot in {dirpath}")
