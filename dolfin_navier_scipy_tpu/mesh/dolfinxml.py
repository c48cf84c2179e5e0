"""Reader for legacy dolfin XML meshes and facet-region MeshFunctions.

Parity feature: users of the reference load gmsh meshes converted to
dolfin XML (problem_setups.py:816, :827 — ``dolfin.Mesh(file)`` and
``MeshFunction('size_t', mesh, facetregionfile)``).  This module reads the
same files (optionally gzipped) into :class:`TriMesh`.
"""

import gzip
import xml.etree.ElementTree as ET

import numpy as np

from .trimesh import TriMesh


def _open_maybe_gz(path):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_dolfin_xml(path) -> TriMesh:
    """Read a dolfin XML triangle mesh (``.xml`` or ``.xml.gz``)."""
    with _open_maybe_gz(path) as f:
        root = ET.parse(f).getroot()
    mesh = root.find("mesh")
    if mesh is None or mesh.get("celltype") != "triangle":
        raise ValueError(f"{path}: not a dolfin triangle mesh")
    vxml = mesh.find("vertices")
    nverts = int(vxml.get("size"))
    verts = np.zeros((nverts, 2))
    for v in vxml:
        i = int(v.get("index"))
        verts[i] = [float(v.get("x")), float(v.get("y"))]
    cxml = mesh.find("cells")
    ncells = int(cxml.get("size"))
    cells = np.zeros((ncells, 3), dtype=np.int64)
    for c in cxml:
        i = int(c.get("index"))
        cells[i] = [int(c.get("v0")), int(c.get("v1")), int(c.get("v2"))]
    return TriMesh(verts, cells)


def read_facet_region(mesh: TriMesh, path) -> TriMesh:
    """Attach facet tags from a dolfin facet-region ``MeshFunction`` XML.

    The file stores per-mesh-entity values indexed by dolfin's internal
    facet numbering, which we reconstruct with dolfin's convention: facets
    are the sorted unique edges in lexicographic order of their sorted
    vertex tuples... **not stable across dolfin versions**, therefore the
    file format variant handled here is the common one that stores
    ``local_entity`` + ``cell_index`` (mesh_value_collection).
    """
    with _open_maybe_gz(path) as f:
        root = ET.parse(f).getroot()
    mvc = root.find("mesh_value_collection")
    if mvc is None:
        # plain mesh_function over facets: values indexed by facet number;
        # dolfin numbers facets by creation order which we cannot know —
        # reject loudly rather than guess.
        raise ValueError(
            f"{path}: only mesh_value_collection facet files are supported"
        )
    from ..fem.reference import LOCAL_EDGES

    tags = {}
    for item in mvc:
        cell = int(item.get("cell_index"))
        loc = int(item.get("local_entity"))
        val = int(item.get("value"))
        edge = mesh.cells[cell, LOCAL_EDGES[loc]]
        tags.setdefault(val, []).append(np.sort(edge))
    mesh.facet_tags = {k: np.array(v) for k, v in tags.items()}
    return mesh
