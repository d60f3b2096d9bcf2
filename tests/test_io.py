"""I/O tests: ExodusII/Gmsh/Netgen round trips, reading the reference's
committed meshes, format detection, and text writers.

Mirrors the reference's meshconv regression suite (format round trips) and
tests/unit/IO/ ExodusII read coverage.
"""

import os

import numpy as np
import pytest

from quinoa_tpu.mesh import box_tet_mesh, tet_geometry
from quinoa_tpu.io import (
    read_exodus,
    write_exodus,
    read_gmsh,
    write_gmsh,
    read_netgen,
    write_netgen,
    read_mesh,
    write_mesh,
    detect_format,
    DiagWriter,
)

REF_EXO = (
    "/root/reference/tests/regression/inciter/compflow/Euler/"
    "SodShocktube/rectangle_01_1.5k.exo"
)


def _same_mesh(a, b, tol=1e-14):
    assert a.nnode == b.nnode and a.nelem == b.nelem
    assert np.allclose(a.coords, b.coords, atol=tol)
    assert np.array_equal(a.inpoel, b.inpoel)
    assert set(a.bface) == set(b.bface)
    for ss in a.bface:
        fa = {tuple(sorted(t)) for t in a.bface[ss].tolist()}
        fb = {tuple(sorted(t)) for t in b.bface[ss].tolist()}
        assert fa == fb, ss


@pytest.fixture(scope="module")
def mesh():
    return box_tet_mesh(3, 3, 3)


def test_reference_exodus_readable():
    """Read a mesh committed by the reference project (SEACAS-written)."""
    m = read_exodus(REF_EXO)
    assert m.nnode == 491
    assert m.nelem == 1516  # the TET4 block
    assert set(m.bface.keys()) == {1, 2, 3, 4, 5, 6}
    assert m.positive_jacobians()
    # total volume of the rectangle domain mesh is positive and finite
    J, _ = tet_geometry(m.coords, m.inpoel)
    assert J.sum() > 0


@pytest.mark.parametrize("fmt,ext", [("exodus", ".exo"), ("gmsh", ".msh"),
                                     ("netgen", ".mesh")])
def test_round_trip(mesh, tmp_path, fmt, ext):
    p = str(tmp_path / f"box{ext}")
    write_mesh(p, mesh, fmt)
    m2 = read_mesh(p, fmt)
    _same_mesh(mesh, m2)


def test_detect_and_cross_convert(mesh, tmp_path):
    """meshconv analog: exodus -> gmsh -> netgen -> exodus round trip."""
    p1 = str(tmp_path / "a.exo")
    p2 = str(tmp_path / "b.msh")
    p3 = str(tmp_path / "c.mesh")
    p4 = str(tmp_path / "d.exo")
    write_mesh(p1, mesh)
    assert detect_format(p1) == "exodus"
    write_mesh(p2, read_mesh(p1))
    assert detect_format(p2) == "gmsh"
    write_mesh(p3, read_mesh(p2))
    assert detect_format(p3) == "netgen"
    write_mesh(p4, read_mesh(p3))
    _same_mesh(mesh, read_mesh(p4))


def test_exodus_node_fields(mesh, tmp_path):
    from quinoa_tpu.io.exodus import read_exodus_fields

    p = str(tmp_path / "fields.exo")
    rho = np.linspace(0, 1, mesh.nnode)
    write_exodus(p, mesh, node_fields={"density": rho}, time=0.25)
    names, times, vals = read_exodus_fields(p)
    assert names == ["density"]
    assert np.isclose(times[0], 0.25)
    assert np.allclose(vals[0, 0], rho)


def test_diag_writer(tmp_path):
    p = str(tmp_path / "diag")
    w = DiagWriter(p, ncomp=2)
    w.write(1, 0.1, 0.1, [1.0, 2.0], [0.01, 0.02], [0.1, 0.2])
    w.write(2, 0.2, 0.1, [1.1, 2.1], [0.02, 0.03], [0.2, 0.3])
    w.close()
    lines = open(p).read().splitlines()
    assert lines[0].startswith("#")
    assert len(lines) == 3
    assert len(lines[1].split()) == 3 + 6


def test_asc_reader(tmp_path):
    """ASC format per src/IO/ASCMeshReader.cpp (1-based ids, node 2/3 swap)."""
    p = tmp_path / "m.asc"
    p.write_text(
        "*ndim 3\n*numNodeSets 0\n*numSideSets 0\n"
        "*nodes 4\n"
        "1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n"
        "*cells 1\n"
        "1 0 0 4 1 3 2\n"  # negatively-oriented input: the reference's
        # node-2/3 swap restores positive volume
    )
    from quinoa_tpu.io import read_asc

    m = read_asc(str(p))
    assert m.nnode == 4 and m.nelem == 1
    assert m.positive_jacobians()


def test_stl_reader(tmp_path):
    p = tmp_path / "t.stl"
    p.write_text(
        "solid box\n"
        "facet normal 0 0 1\nouter loop\n"
        "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
        "endloop\nendfacet\n"
        "facet normal 0 0 1\nouter loop\n"
        "vertex 1 0 0\nvertex 1 1 0\nvertex 0 1 0\n"
        "endloop\nendfacet\n"
        "endsolid box\n"
    )
    from quinoa_tpu.io import read_stl

    s = read_stl(str(p))
    assert s.tri.shape == (2, 3)
    assert s.coords.shape[0] == 4  # welded shared vertices


def test_h5part_writer(tmp_path):
    import h5py
    from quinoa_tpu.io import H5PartWriter

    p = str(tmp_path / "traj.h5part")
    w = H5PartWriter(p)
    xyz = np.random.default_rng(0).normal(size=(100, 3))
    w.write(xyz, fields={"vx": xyz[:, 0] * 2}, time=0.1)
    w.write(xyz + 1.0, time=0.2)
    w.close()
    with h5py.File(p) as f:
        assert set(f.keys()) == {"Step#0", "Step#1"}
        assert np.allclose(f["Step#0"]["x"][:], xyz[:, 0])
        assert np.allclose(f["Step#0"]["vx"][:], xyz[:, 0] * 2)
        assert f["Step#1"].attrs["TimeValue"] == 0.2


def test_pdf_outputs(tmp_path):
    """Uni (txt) + bi-variate (txt/gmsh/exodus) PDF writers."""
    import jax
    from quinoa_tpu.statistics import estimate_pdf
    from quinoa_tpu.io import write_pdf_txt, write_pdf_gmsh, write_pdf_exodus
    from quinoa_tpu.io.gmsh import read_gmsh

    rng = np.random.default_rng(0)
    P = np.stack([rng.normal(size=20000), rng.normal(size=20000)], 1)
    import jax.numpy as jnp

    pdf2 = estimate_pdf(jnp.asarray(P), {"y": 0}, (("y", 0), ("y", 1)),
                        binsize=[0.25, 0.25])
    p1 = str(tmp_path / "p.txt")
    write_pdf_txt(p1, pdf2)
    assert len(open(p1).read().splitlines()) > 10

    p2 = str(tmp_path / "p.msh")
    write_pdf_gmsh(p2, pdf2)
    txt = open(p2).read()
    assert "$ElementData" in txt and "probability" in txt

    p3 = str(tmp_path / "p.exo")
    write_pdf_exodus(p3, pdf2)
    from scipy.io import netcdf_file

    f = netcdf_file(p3, "r", mmap=False)
    dens = np.array(f.variables["vals_nod_var1"][0])
    f.close()
    # density integrates to ~1
    assert abs(dens.sum() * 0.25 * 0.25 - 1.0) < 0.05


def test_exodus_elem_fields(mesh, tmp_path):
    """Element (cell) variables round-trip — the reference's DG output
    layout (vals_elem_var{i}eb1)."""
    from quinoa_tpu.io import read_exodus_elem_fields

    p = str(tmp_path / "ef.exo")
    vol = np.arange(mesh.nelem, dtype=float)
    write_exodus(p, mesh, elem_fields={"r": vol, "e": 2 * vol}, time=0.5)
    names, times, vals = read_exodus_elem_fields(p)
    assert names == ["r", "e"]
    assert np.isclose(times[0], 0.5)
    assert np.allclose(vals[0, 0], vol)
    assert np.allclose(vals[0, 1], 2 * vol)


def test_exodus_pieces_round_trip(tmp_path):
    """Partitioned per-shard output + joiner: 4 pieces with number maps
    reassemble into the exact global mesh and fields (MeshWriter chare
    group analog, but joinable)."""
    from quinoa_tpu.io import write_exodus_pieces, join_exodus_pieces
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.parallel.partition import partition_elements

    mesh = box_tet_mesh(4, 4, 4)
    parts = partition_elements(mesh.coords, mesh.inpoel, 4)
    rng = np.random.default_rng(0)
    nf = {"c0": rng.normal(size=mesh.nnode)}
    ef = {"r": rng.normal(size=mesh.nelem)}

    paths = write_exodus_pieces(str(tmp_path / "out"), mesh, parts,
                                node_fields=nf, elem_fields=ef,
                                time=0.125, it=7)
    assert len(paths) == 4
    assert paths[0].endswith("out.e-s.7.4.0")  # reference naming

    m2, nf2, ef2, t2 = join_exodus_pieces(paths)
    assert m2.nnode == mesh.nnode and m2.nelem == mesh.nelem
    assert np.allclose(m2.coords, mesh.coords)
    assert np.array_equal(m2.inpoel, mesh.inpoel)
    assert np.isclose(t2, 0.125)
    assert np.allclose(nf2["c0"], nf["c0"])
    assert np.allclose(ef2["r"], ef["r"])
    # every global boundary triangle recovered exactly once
    for ss in mesh.bface:
        a = {tuple(sorted(t)) for t in mesh.bface[ss].tolist()}
        b = {tuple(sorted(t)) for t in m2.bface[ss].tolist()}
        assert a == b


def test_gmsh_binary_round_trip(mesh, tmp_path):
    """msh 2.2 binary write/read + cross ascii/binary equivalence (the
    reference's GmshMeshReader handles both file types)."""
    from quinoa_tpu.io.gmsh import write_gmsh, read_gmsh

    pb = str(tmp_path / "b.msh")
    pa = str(tmp_path / "a.msh")
    write_gmsh(pb, mesh, binary=True)
    write_gmsh(pa, mesh, binary=False)
    _same_mesh(mesh, read_gmsh(pb))
    mb, ma = read_gmsh(pb), read_gmsh(pa)
    assert np.allclose(mb.coords, ma.coords)
    assert np.array_equal(mb.inpoel, ma.inpoel)
    # binary is detected by the same magic ($MeshFormat header is text)
    assert detect_format(pb) == "gmsh"
    from quinoa_tpu.io import read_mesh
    _same_mesh(mesh, read_mesh(pb))


def test_hypermesh_reader(tmp_path):
    """HyperMesh XML metadata + coordinate/connectivity sidecars
    (HyperMeshReader.cpp); ids normalized, inverted tets fixed."""
    (tmp_path / "m.xml").write_text(
        '<mesh>\n <coordinates file="pts.txt"/>\n'
        ' <element_set file="conn.txt" topology="four_node_tet"/>\n</mesh>\n'
    )
    (tmp_path / "pts.txt").write_text(
        "1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n5 1 1 1\n")
    # 1-based ids, second tet negatively oriented on purpose
    (tmp_path / "conn.txt").write_text("1 1 2 3 4\n2 2 3 5 4\n")
    from quinoa_tpu.io import read_hypermesh, read_mesh, detect_format

    m = read_hypermesh(str(tmp_path / "m.xml"))
    assert m.nnode == 5 and m.nelem == 2
    assert m.positive_jacobians()
    assert detect_format(str(tmp_path / "m.xml")) == "hypermesh"
    m2 = read_mesh(str(tmp_path / "m.xml"))
    assert np.array_equal(m2.inpoel, m.inpoel)


def test_meshconv_join_pieces(tmp_path, monkeypatch):
    """meshconv with multiple inputs joins exodus pieces into one file
    (the inverse of --pieces output)."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io import write_exodus_pieces, read_exodus
    from quinoa_tpu.io.exodus import read_exodus_elem_fields
    from quinoa_tpu.mesh import box_tet_mesh
    from quinoa_tpu.parallel.partition import partition_elements

    m = box_tet_mesh(3, 3, 3)
    parts = partition_elements(m.coords, m.inpoel, 3)
    ef = {"r": np.arange(m.nelem, dtype=float)}
    monkeypatch.chdir(tmp_path)
    paths = write_exodus_pieces("o", m, parts, elem_fields=ef, time=0.5,
                                it=2)
    rc = main(["meshconv", "-i", *paths, "-o", "joined.exo", "-v"])
    assert rc == 0
    mj = read_exodus("joined.exo")
    assert mj.nnode == m.nnode and mj.nelem == m.nelem
    names, times, vals = read_exodus_elem_fields("joined.exo")
    assert names == ["r"] and np.isclose(times[-1], 0.5)
    assert np.allclose(vals[-1, 0], ef["r"])


def test_exodus_hdf5_netcdf4(tmp_path):
    """netcdf-4 (HDF5) exodus files route through the h5py adapter
    (SEACAS writes these when built with HDF5; scipy only reads
    classic).  Convert a committed reference mesh to the netCDF-4
    layout and compare against the classic read."""
    import h5py
    from scipy.io import netcdf_file
    from quinoa_tpu.io.exodus import read_exodus

    src = ("/root/reference/tests/regression/inciter/mesh_refinement/"
           "dtref/unitcube_1k.exo")
    dst = str(tmp_path / "unitcube_1k_h5.exo")
    fin = netcdf_file(src, "r", mmap=False)
    with h5py.File(dst, "w") as out:
        for name, size in fin.dimensions.items():
            if name in fin.variables:
                continue  # written below as a coordinate variable
            n = int(size) if size else len(fin.variables.get(
                "time_whole", np.zeros(0))[:])
            d = out.create_dataset(name, data=np.zeros(max(n, 1)))
            d.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
            d.attrs["NAME"] = np.bytes_(
                f"This is a netCDF dimension but not a netCDF variable."
                f"{n:10d}")
        for name, var in fin.variables.items():
            data = np.array(var[:])
            d = out.create_dataset(name, data=data)
            if name in fin.dimensions:
                d.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
                d.attrs["NAME"] = np.bytes_(name)
    fin.close()

    a = read_exodus(src)
    b = read_exodus(dst)
    np.testing.assert_array_equal(a.inpoel, b.inpoel)
    np.testing.assert_allclose(a.coords, b.coords)
    assert set(a.bface) == set(b.bface)
    for k in a.bface:
        np.testing.assert_array_equal(a.bface[k], b.bface[k])


def test_exodus_netcdf4_writer_round_trip(mesh, tmp_path):
    """fmt='netcdf4' writes the HDF5 layout (dimension scales) that the
    h5py read adapter and any netCDF-4 reader consume; round-trips the
    mesh, side sets, and nodal fields."""
    from quinoa_tpu.io.exodus import read_exodus, read_exodus_fields, \
        write_exodus

    p = str(tmp_path / "m4.exo")
    nf = {"c0_numerical": np.linspace(0.0, 1.0, mesh.nnode)}
    write_exodus(p, mesh, node_fields=nf, time=0.25, fmt="netcdf4")
    with open(p, "rb") as fh:
        assert fh.read(4) == b"\x89HDF"
    m2 = read_exodus(p)
    np.testing.assert_array_equal(m2.inpoel, mesh.inpoel)
    np.testing.assert_allclose(m2.coords, mesh.coords)
    assert set(m2.bface) == set(mesh.bface)
    names, times, vals = read_exodus_fields(p)
    assert names == ["c0_numerical"]
    np.testing.assert_allclose(vals[0, 0], nf["c0_numerical"])
    assert times[0] == 0.25


def test_fileconv_classic_to_netcdf4(mesh, tmp_path, monkeypatch):
    """fileconv converts ExodusII field files between the classic and
    netcdf-4 layouts (the executable's ROOT half needs the absent ROOT
    lib and reports so)."""
    from quinoa_tpu.cli import main
    from quinoa_tpu.io.exodus import read_exodus_fields, write_exodus

    src = str(tmp_path / "in.exo")
    nf = {"c0_numerical": np.linspace(0.0, 1.0, mesh.nnode)}
    write_exodus(src, mesh, node_fields=nf, time=0.5)
    dst = str(tmp_path / "out4.exo")
    assert main(["fileconv", "-i", src, "-o", dst]) == 0
    with open(dst, "rb") as fh:
        assert fh.read(4) == b"\x89HDF"
    names, times, vals = read_exodus_fields(dst)
    assert names == ["c0_numerical"]
    np.testing.assert_allclose(vals[-1, 0], nf["c0_numerical"])
    # and back to classic
    back = str(tmp_path / "back.exo")
    assert main(["fileconv", "-i", dst, "-o", back]) == 0
    with open(back, "rb") as fh:
        assert fh.read(3) == b"CDF"
    # a non-exodus input reports the missing ROOT backend
    bad = tmp_path / "x.root"
    bad.write_bytes(b"root\x00\x00\x00\x00")
    assert main(["fileconv", "-i", str(bad), "-o", "y"]) == 1


def test_write_pdf_exodus_univariate(tmp_path):
    """filetype exodusii with a 1-D PDF request (the reference supports
    uni/bi/tri for every filetype) must not crash: bin-center point line
    with the nodal density field."""
    import numpy as np
    from scipy.io import netcdf_file
    from quinoa_tpu.io import write_pdf_exodus
    from quinoa_tpu.statistics.pdf import UniPDF

    pdf = UniPDF(binsize=0.5, lo=-1.0, counts=np.array([1, 3, 4, 2]))
    p = str(tmp_path / "u.exo")
    write_pdf_exodus(p, pdf)
    f = netcdf_file(p, "r", mmap=False)
    x = np.array(f.variables["coordx"][:])
    d = np.array(f.variables["vals_nod_var1"][0, :])
    f.close()
    assert x.shape == (4,) and np.allclose(x, [-0.75, -0.25, 0.25, 0.75])
    assert np.isclose(d.sum() * 0.5, 1.0)
