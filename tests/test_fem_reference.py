"""Unit tests for reference elements and quadrature."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.fem.reference import (
    dshape_p1,
    dshape_p2,
    edge_quadrature,
    shape_p1,
    shape_p2,
    tri_quadrature,
)


@pytest.mark.parametrize("deg", [1, 2, 4, 5, 7])
def test_tri_quadrature_exactness(deg):
    pts, wts = tri_quadrature(deg)
    # integral of x^a y^b over ref triangle = a! b! / (a+b+2)!
    from math import factorial

    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
            approx = (wts * pts[:, 0] ** a * pts[:, 1] ** b).sum()
            assert np.isclose(approx, exact, rtol=1e-12, atol=1e-15), (a, b)


def test_edge_quadrature():
    s, w = edge_quadrature(3)
    for k in range(6):
        assert np.isclose((w * s ** k).sum(), 1.0 / (k + 1))


def test_partition_of_unity():
    pts, _ = tri_quadrature(5)
    assert np.allclose(shape_p1(pts).sum(1), 1.0)
    assert np.allclose(shape_p2(pts).sum(1), 1.0)
    assert np.allclose(dshape_p1(pts).sum(1), 0.0)
    assert np.allclose(dshape_p2(pts).sum(1), 0.0, atol=1e-13)


def test_p2_nodal_property():
    nodes = np.array([
        [0, 0], [1, 0], [0, 1],          # vertices
        [0.5, 0.5], [0, 0.5], [0.5, 0],  # midpoints of edges opp v0,v1,v2
    ], dtype=float)
    vals = shape_p2(nodes)
    assert np.allclose(vals, np.eye(6), atol=1e-14)


def test_p2_gradients_fd():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.4, size=(5, 2))
    eps = 1e-7
    d = dshape_p2(pts)
    for k in range(2):
        dp = pts.copy()
        dp[:, k] += eps
        dm = pts.copy()
        dm[:, k] -= eps
        fd = (shape_p2(dp) - shape_p2(dm)) / (2 * eps)
        assert np.allclose(fd, d[:, :, k], atol=1e-6)
