"""Geometric mesh partitioners (host-side, NumPy).

Counterpart of the reference's Zoltan2 interop (src/LoadBalance/
ZoltanInterOp.cpp:29-133: RCB/RIB/HSFC/MJ over element centroids).  The TPU
build partitions once per (re)mesh on the host:

- ``morton_partition``: Hilbert-flavored space-filling-curve ordering by
  Morton code over quantized centroids, split into equal-count contiguous
  chunks — the HSFC analog, and the default (best locality per byte of
  metadata, deterministic).
- ``rcb_partition``: recursive coordinate bisection by median along the
  widest axis — the RCB analog.

Both return a per-element shard assignment in [0, nparts).
"""

from __future__ import annotations

import numpy as np


def element_centroids(coords: np.ndarray, inpoel: np.ndarray) -> np.ndarray:
    return coords[inpoel].mean(axis=1)


def _morton_codes(pts: np.ndarray, bits: int = 21) -> np.ndarray:
    """Interleaved Morton codes of 3-D points quantized to `bits` per axis."""
    lo = pts.min(axis=0)
    span = pts.max(axis=0) - lo
    span[span == 0] = 1.0
    q = ((pts - lo) / span * ((1 << bits) - 1)).astype(np.uint64)

    def spread(x):
        # spread the low 21 bits of x so there are 2 zero bits between bits
        x &= np.uint64(0x1FFFFF)
        x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )


def morton_partition(centroids: np.ndarray, nparts: int) -> np.ndarray:
    """Equal-count SFC partition: sort by Morton code, chunk contiguously.

    Uses the native Morton-code kernel when available."""
    from ..native import morton_codes as _native

    n = centroids.shape[0]
    codes = _native(centroids)
    if codes is None:
        codes = _morton_codes(centroids)
    order = np.argsort(codes, kind="stable")
    part = np.empty(n, dtype=np.int32)
    # equal-count split (differ by at most 1)
    bounds = (np.arange(1, nparts) * n) // nparts
    part[order] = np.searchsorted(bounds, np.arange(n), side="right")
    return part


def rcb_partition(centroids: np.ndarray, nparts: int) -> np.ndarray:
    """Recursive coordinate bisection into `nparts` equal-count parts.

    Handles non-power-of-two counts by splitting proportionally.
    """
    n = centroids.shape[0]
    part = np.zeros(n, dtype=np.int32)

    def recurse(idx: np.ndarray, base: int, k: int):
        if k == 1:
            part[idx] = base
            return
        pts = centroids[idx]
        ax = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        k_lo = k // 2
        # proportional split point so all parts end up equal-count
        cut = (len(idx) * k_lo) // k
        order = np.argsort(pts[:, ax], kind="stable")
        recurse(idx[order[:cut]], base, k_lo)
        recurse(idx[order[cut:]], base + k_lo, k - k_lo)

    recurse(np.arange(n, dtype=np.int64), 0, nparts)
    return part


_ALGOS = {"sfc": morton_partition, "hsfc": morton_partition, "rcb": rcb_partition}


def partition_elements(
    coords: np.ndarray, inpoel: np.ndarray, nparts: int, algorithm: str = "sfc"
) -> np.ndarray:
    """Partition elements by centroid into `nparts` shards."""
    if nparts < 1:
        raise ValueError("nparts must be >= 1")
    if nparts == 1:
        return np.zeros(inpoel.shape[0], dtype=np.int32)
    try:
        algo = _ALGOS[algorithm]
    except KeyError:
        raise ValueError(f"unknown partitioning algorithm {algorithm!r}") from None
    return algo(element_centroids(coords, inpoel), nparts)
