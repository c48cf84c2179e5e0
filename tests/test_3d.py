"""3D (tetrahedral P2/P1) tests: quadrature, extrusion, manufactured
Stokes/NSE exactness, kernel identities — covering the reference's 3D
setups (problem_setups.py:630-770, :1200-1417)."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.fem.reference3d import (
    dshape_p2_3d,
    shape_p1_3d,
    shape_p2_3d,
    tet_quadrature,
)
from dolfin_navier_scipy_tpu.mesh import unit_square
from dolfin_navier_scipy_tpu.mesh.tetmesh import extrude_trimesh
from dolfin_navier_scipy_tpu.models.problem import GeoSetup, build_problem
from dolfin_navier_scipy_tpu.ops.assemble import assemble_rhs
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

NU = 0.85


def test_tet_quadrature_exactness():
    from math import factorial

    pts, wts = tet_quadrature(5)
    for a in range(5):
        for b in range(5 - a):
            for c in range(5 - a - b):
                exact = (factorial(a) * factorial(b) * factorial(c)
                         / factorial(a + b + c + 3))
                approx = (wts * pts[:, 0] ** a * pts[:, 1] ** b
                          * pts[:, 2] ** c).sum()
                assert np.isclose(approx, exact, rtol=1e-12), (a, b, c)


def test_p2_3d_partition_and_gradients():
    pts, _ = tet_quadrature(3)
    N = shape_p2_3d(pts)
    assert np.allclose(N.sum(1), 1.0)
    eps = 1e-7
    d = dshape_p2_3d(pts)
    for k in range(3):
        dp = pts.copy()
        dp[:, k] += eps
        dm = pts.copy()
        dm[:, k] -= eps
        fd = (shape_p2_3d(dp) - shape_p2_3d(dm)) / (2 * eps)
        assert np.allclose(fd, d[:, :, k], atol=1e-6)


def test_extrusion_volume_and_tags():
    m2 = unit_square(3)
    m = extrude_trimesh(m2, nz=3, height=1.0)
    _, det, _ = m.cell_jacobians()
    assert np.all(det > 0)
    assert np.isclose(det.sum() / 6.0, 1.0)    # unit cube volume
    for tag in (1, 2, 3, 4, 8, 9):
        fc, fl = m.tagged_facets(tag)
        assert len(fc) > 0


def _box_problem(with_convection):
    m2 = unit_square(3)
    mesh = extrude_trimesh(m2, nz=3, height=1.0)
    exact = lambda x: (x[1] ** 2, x[2] ** 2, x[0] ** 2)  # noqa: E731
    geo = GeoSetup(charlen=1.0, ppin=-1,
                   moving_wall_tags=[1, 2, 3, 4, 8, 9])
    geo.moving_wall_fns = {t: exact for t in geo.moving_wall_tags}
    prob = build_problem(mesh, geo, nu=NU, charvel=1.0)

    def f(x):
        fx = -2 * NU + 1.0
        fy = -2 * NU + 1.0
        fz = -2 * NU + 1.0
        if with_convection:
            fx += 2 * x[2] ** 2 * x[1]
            fy += 2 * x[0] ** 2 * x[2]
            fz += 2 * x[1] ** 2 * x[0]
        return (fx, fy, fz)

    fv_full, fp_full = assemble_rhs(prob.ctx, fv_fn=f)
    from dolfin_navier_scipy_tpu.ops.condense import condense_sysmats

    _, rhsbc, _, _, _ = condense_sysmats(
        prob.full, [prob.bcinds], [prob.bcvals], invinds=prob.invinds)
    prob.fv = fv_full[prob.invinds] + rhsbc["fv"]
    prob.fp = fp_full[:-1] + rhsbc["fp"][:-1]
    prob.fv_body_full = fv_full
    return prob


def _exact_fields(prob):
    c = prob.space.p2_coords
    u = np.stack([c[:, 1] ** 2, c[:, 2] ** 2, c[:, 0] ** 2], 1).ravel()
    pex = prob.space.mesh.verts.sum(1)
    return u, pex


def test_stokes_3d_manufactured_exact():
    prob = _box_problem(with_convection=False)
    v, p = solve_steadystate_nse(prob, only_stokes=True, return_vp=True,
                                 verbose=False)
    uex, pex = _exact_fields(prob)
    assert np.allclose(v.ravel(), uex, atol=1e-9)
    pfull = np.concatenate([p.ravel(), [0.0]])
    assert np.allclose(pfull, pex - pex[-1], atol=1e-8)


def test_nse_3d_manufactured_exact():
    prob = _box_problem(with_convection=True)
    (v, p), norms = solve_steadystate_nse(
        prob, return_vp=True, vel_nwtn_tol=1e-12, verbose=False,
        return_nwtnupd_norms=True)
    uex, pex = _exact_fields(prob)
    assert np.allclose(v.ravel(), uex, atol=1e-8)
    assert norms[-1] < 1e-12


def test_3d_timeint_preserves_steady():
    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.solve import cnab

    prob = _box_problem(with_convection=True)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = vss.ravel()[prob.invinds]
    out = cnab(trange=np.linspace(0, 0.1, 21), prob=prob, inivel=v0,
               save_every=None)
    assert not out["ffflag"]
    assert np.abs(np.asarray(out["v"]) - v0).max() < 1e-8
