"""One-time extraction of the hydro-timescale / production DNS data tables.

The reference embeds y=f(t) DNS data series in C++ headers
(src/DiffEq/HydroTimeScales.hpp: invhts_eq_*, HydroProductions.hpp:
prod_*).  These are DATA (Rayleigh-Taylor DNS extractions), not code —
the walker's hydrotimescale coefficient policy needs them verbatim for
parity, exactly like the committed .std regression baselines.  This
script parses the headers and stores the series as float64 arrays in
quinoa_tpu/diffeq/hydro_tables.npz.

Usage: python tools/extract_hydro_tables.py [reference_src_dir]
"""

import re
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/DiffEq"

ROW = re.compile(r"^\s*\{\s*([0-9eE.+-]+)\s*,\s*([0-9eE.+-]+)\s*\}\s*,?\s*$")
HEAD = re.compile(r"const\s+tk::Table\s+(\w+)\s*\{")


def parse(path):
    tables = {}
    name, rows = None, []
    for line in open(path):
        m = HEAD.search(line)
        if m:
            name, rows = m.group(1), []
            continue
        if name is None:
            continue
        r = ROW.match(line)
        if r:
            rows.append((float(r.group(1)), float(r.group(2))))
        elif "};" in line:
            tables[name] = np.asarray(rows, dtype=np.float64)
            name = None
    return tables

out = {}
out.update(parse(f"{SRC}/HydroTimeScales.hpp"))
out.update(parse(f"{SRC}/HydroProductions.hpp"))
for k, v in sorted(out.items()):
    # the reference's invhts_eq_A005H carries one out-of-order row (a DNS
    # series glitch its linear-scan sampler tolerates); sort by t so the
    # vectorized interp sees a monotone abscissa
    order = np.argsort(v[:, 0], kind="stable")
    v = v[order]
    keep = np.concatenate([[True], np.diff(v[:, 0]) > 0])
    v = out[k] = v[keep]
    assert v.ndim == 2 and v.shape[1] == 2 and (np.diff(v[:, 0]) > 0).all(), k
    print(f"{k:22s} {v.shape[0]:5d} rows  t in [{v[0,0]:.3g}, {v[-1,0]:.3g}]")
np.savez_compressed("quinoa_tpu/diffeq/hydro_tables.npz", **out)
print(f"wrote {len(out)} tables")
