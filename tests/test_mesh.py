"""Mesh generator / container sanity tests."""

import numpy as np

from dolfin_navier_scipy_tpu.mesh import TriMesh, unit_square
from dolfin_navier_scipy_tpu.mesh.generators import channel_with_cylinder


def test_unit_square_area_and_tags():
    m = unit_square(7)
    _, det, _ = m.cell_jacobians()
    assert np.all(det > 0)
    assert np.isclose(det.sum() / 2, 1.0)
    edges, cells, locs = m.boundary_edges()
    assert len(edges) == 4 * 7
    for tag in (1, 2, 3, 4):
        fc, fl = m.tagged_facets(tag)
        assert len(fc) == 7


def test_channel_with_cylinder_geometry():
    m = channel_with_cylinder(level=1)
    _, det, _ = m.cell_jacobians()
    assert np.all(det > 0)
    r = 0.05
    # area = channel minus polygonal cylinder (polygon slightly smaller)
    n_theta = 48
    poly_area = 0.5 * n_theta * r ** 2 * np.sin(2 * np.pi / n_theta)
    assert np.isclose(det.sum() / 2, 2.2 * 0.41 - poly_area, rtol=1e-6)
    # all five boundary tags populated
    for tag in (1, 2, 3, 4, 5):
        fc, _ = m.tagged_facets(tag)
        assert len(fc) > 0
    # cylinder facets: all endpoints on the circle
    fc, fl = m.tagged_facets(5)
    assert len(fc) == n_theta


def test_locate_and_normals():
    m = unit_square(4)
    cells, bary = m.locate(np.array([[0.33, 0.41], [0.9, 0.1]]))
    assert np.all(cells >= 0)
    assert np.allclose(bary.sum(1), 1.0)
    edges, cells_, locs = m.boundary_edges()
    for c, le, e in zip(cells_[:8], locs[:8], edges[:8]):
        n = m.facet_normal(c, le)
        assert np.isclose(np.linalg.norm(n), 1.0)
