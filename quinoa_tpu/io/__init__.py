"""Mesh and field I/O.

Counterpart of the reference's src/IO/ layer (~7.6k LoC of ExodusII/Gmsh/
Netgen/ASC readers-writers plus diagnostics/statistics writers): ExodusII
files are NetCDF-3 classic and are read/written natively through
scipy.io.netcdf_file — the same on-disk format the reference produces via
the SEACAS exodus library — so meshes and field output interoperate with
the reference tool chain (exodiff, ParaView).
"""

from .exodus import (
    read_exodus, write_exodus, read_exodus_elem_fields, read_exodus_maps,
)
from .pieces import write_exodus_pieces, join_exodus_pieces, extract_piece
from .gmsh import read_gmsh, write_gmsh
from .netgen import read_netgen, write_netgen
from .asc import read_asc
from .hypermesh import read_hypermesh
from .stl import read_stl, STLMesh
from .h5part import H5PartWriter
from .meshfactory import read_mesh, write_mesh, detect_format
from .diagwriter import DiagWriter
from .statwriter import TxtStatWriter
from .pdfwriter import write_pdf_txt, write_pdf_gmsh, write_pdf_exodus

__all__ = [
    "read_exodus",
    "write_exodus",
    "read_exodus_elem_fields",
    "read_exodus_maps",
    "write_exodus_pieces",
    "join_exodus_pieces",
    "extract_piece",
    "read_gmsh",
    "write_gmsh",
    "read_netgen",
    "write_netgen",
    "read_asc",
    "read_hypermesh",
    "read_stl",
    "STLMesh",
    "H5PartWriter",
    "read_mesh",
    "write_mesh",
    "detect_format",
    "DiagWriter",
    "TxtStatWriter",
    "write_pdf_txt",
    "write_pdf_gmsh",
    "write_pdf_exodus",
]
