"""Gmsh 2.2 mesh reader/writer (ASCII).

Counterpart of the reference's GmshMeshReader/Writer (src/IO/GmshMesh*.cpp,
msh format 2.2): $Nodes / $Elements with element type 4 = TET4 and
type 2 = TRI3; the first tag (physical group) of a boundary triangle is
its side-set id, matching the reference's meshconv convention.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..mesh.unsmesh import UnsMesh


def read_gmsh(path: str) -> UnsMesh:
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0

    def until(tag):
        nonlocal i
        while i < len(lines) and lines[i].strip() != tag:
            i += 1
        i += 1

    until("$MeshFormat")
    ver = lines[i].split()
    if not ver or not ver[0].startswith("2"):
        raise ValueError(f"unsupported msh version {ver}: only 2.x ASCII")
    if ver[1] != "0":
        raise ValueError("binary msh not supported yet")

    until("$Nodes")
    nnode = int(lines[i]); i += 1
    ids = np.empty(nnode, dtype=np.int64)
    coords = np.empty((nnode, 3))
    for k in range(nnode):
        parts = lines[i + k].split()
        ids[k] = int(parts[0])
        coords[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
    i += nnode
    id2idx = {int(g): k for k, g in enumerate(ids)}

    until("$Elements")
    nelem = int(lines[i]); i += 1
    tets = []
    bface = defaultdict(list)
    for k in range(nelem):
        parts = lines[i + k].split()
        etype = int(parts[1])
        ntags = int(parts[2])
        tags = [int(x) for x in parts[3 : 3 + ntags]]
        conn = [id2idx[int(x)] for x in parts[3 + ntags :]]
        if etype == 4:
            tets.append(conn)
        elif etype == 2:
            ss = tags[0] if tags else 1
            bface[ss].append(conn)

    mesh = UnsMesh(
        coords=coords,
        inpoel=np.asarray(tets, dtype=np.int32).reshape(-1, 4),
    )
    mesh.bface = {
        ss: np.asarray(v, dtype=np.int32) for ss, v in bface.items()
    }
    mesh.bnode = mesh.bnode_from_bface()
    return mesh


def write_gmsh(path: str, mesh: UnsMesh) -> None:
    with open(path, "w") as fh:
        fh.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        fh.write(f"$Nodes\n{mesh.nnode}\n")
        for k in range(mesh.nnode):
            x, y, z = mesh.coords[k]
            fh.write(f"{k + 1} {x:.16g} {y:.16g} {z:.16g}\n")
        fh.write("$EndNodes\n")
        ntris = sum(len(v) for v in mesh.bface.values())
        fh.write(f"$Elements\n{mesh.nelem + ntris}\n")
        eid = 1
        for ss in sorted(mesh.bface.keys()):
            for tri in mesh.bface[ss]:
                a, b, c = (int(n) + 1 for n in tri)
                fh.write(f"{eid} 2 2 {ss} {ss} {a} {b} {c}\n")
                eid += 1
        for e in range(mesh.nelem):
            a, b, c, d = (int(n) + 1 for n in mesh.inpoel[e])
            fh.write(f"{eid} 4 2 0 0 {a} {b} {c} {d}\n")
            eid += 1
        fh.write("$EndElements\n")
