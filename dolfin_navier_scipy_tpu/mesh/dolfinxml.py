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


def dolfin_edge_numbering(cells):
    """Reconstruct the facet (edge) numbering of the reference's
    ``*_facet_region`` files.

    The bundled files (written by the gmsh→dolfin conversion pipeline the
    reference used, consumed at problem_setups.py:827) index facets in
    **lexicographic order of their ascending vertex pairs** — verified
    geometrically against every bundled mesh: all inflow edges land on
    the inlet plane, all lift-drag edges on the cylinder circle, etc.
    (see tests/test_reference_meshes.py).

    Returns ``(nedges, 2)`` vertex pairs, row ``i`` = facet ``i``.
    """
    tris = np.sort(np.asarray(cells), axis=1)
    e = np.concatenate([tris[:, [1, 2]], tris[:, [0, 2]], tris[:, [0, 1]]])
    return np.unique(e, axis=0)


def read_facet_region(mesh: TriMesh, path) -> TriMesh:
    """Attach facet tags from a dolfin facet-region ``MeshFunction`` XML.

    Handles both on-disk variants:

    * ``mesh_function`` over facets (what all of the reference's bundled
      ``*_facet_region.xml.gz`` files are): per-facet values indexed by
      dolfin's internal facet numbering, reconstructed from the mesh
      topology via :func:`dolfin_edge_numbering`;
    * ``mesh_value_collection``: ``(cell_index, local_entity, value)``
      triples.

    Tags land in ``mesh.facet_tags``: value -> ``(k, 2)`` sorted vertex
    pairs.  The untagged value 0 is kept out (interior facets).
    """
    with _open_maybe_gz(path) as f:
        root = ET.parse(f).getroot()
    tags = {}
    mf = root.find("mesh_function")
    if mf is not None:
        if mf.get("dim") not in (None, "1"):
            raise ValueError(f"{path}: facet mesh_function must have dim=1")
        edges = dolfin_edge_numbering(mesh.cells)
        size = int(mf.get("size", len(edges)))
        if size != len(edges):
            raise ValueError(
                f"{path}: {size} entities vs {len(edges)} mesh edges — "
                "facet file does not match this mesh")
        for item in mf:
            val = int(item.get("value"))
            if val == 0:
                continue
            tags.setdefault(val, []).append(edges[int(item.get("index"))])
    else:
        mvc = root.find("mesh_value_collection")
        if mvc is None:
            raise ValueError(
                f"{path}: neither mesh_function nor mesh_value_collection")
        from ..fem.reference import LOCAL_EDGES

        for item in mvc:
            cell = int(item.get("cell_index"))
            loc = int(item.get("local_entity"))
            val = int(item.get("value"))
            edge = mesh.cells[cell, LOCAL_EDGES[loc]]
            tags.setdefault(val, []).append(np.sort(edge))
    mesh.facet_tags = {k: np.array(v) for k, v in tags.items()}
    return mesh
