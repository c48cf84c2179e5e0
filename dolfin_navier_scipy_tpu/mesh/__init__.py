"""Meshes: triangle mesh container, generators, dolfin-XML reader."""

from .trimesh import TriMesh  # noqa: F401
from .generators import unit_square, channel_with_cylinder  # noqa: F401
from .dolfinxml import read_dolfin_xml, read_facet_region  # noqa: F401
