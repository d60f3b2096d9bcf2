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
