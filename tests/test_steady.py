"""Steady solvers: manufactured-solution exactness and benchmark smoke.

The polynomial manufactured solution ``u=(y^2, x^2), p=x+y`` lies exactly
in the Taylor-Hood space, so Stokes and steady-NSE solves must reproduce
it to solver precision — a machine-accuracy test of assembly, BC
condensation, sign conventions, convection and the Newton loop at once.
"""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.fem.dofmap import TaylorHoodSpace
from dolfin_navier_scipy_tpu.mesh import unit_square
from dolfin_navier_scipy_tpu.models.problem import GeoSetup, build_problem
from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.ops.assemble import assemble_rhs
from dolfin_navier_scipy_tpu.solve import get_pfromv, solve_steadystate_nse

NU = 0.85


def _manufactured_problem(n=8, with_convection=True):
    """Unit square, Dirichlet everywhere from the exact solution."""
    mesh = unit_square(n)
    geo = GeoSetup(
        charlen=1.0,
        wall_tags=[1, 2, 3],
        inflow_tag=4,
        inflow_fn=lambda x: (x[1] ** 2, x[0] ** 2),
        ppin=-1,
    )
    # overwrite the wall bcs with the exact field: use moving-wall hooks
    geo.wall_tags = []
    geo.moving_wall_tags = [1, 2, 3]
    exact = lambda x: (x[1] ** 2, x[0] ** 2)  # noqa: E731
    geo.moving_wall_fns = {t: exact for t in (1, 2, 3)}
    prob = build_problem(mesh, geo, nu=NU, charvel=1.0)

    # body force: f = -nu lap u + grad p (+ (u.grad)u)
    def f(x):
        fx = -NU * 2.0 + 1.0
        fy = -NU * 2.0 + 1.0
        if with_convection:
            fx += 2 * x[0] ** 2 * x[1]
            fy += 2 * x[0] * x[1] ** 2
        return (fx, fy)

    fv_full, fp_full = assemble_rhs(prob.ctx, fv_fn=f)
    # re-merge the rhs: body force + boundary folds
    from dolfin_navier_scipy_tpu.ops.condense import condense_sysmats

    mats = prob.full
    _, rhsbc, invinds, _, _ = condense_sysmats(
        mats, [prob.bcinds], [prob.bcvals], invinds=prob.invinds
    )
    prob.fv = fv_full[prob.invinds] + rhsbc["fv"]
    prob.fp = fp_full[:-1] + rhsbc["fp"][:-1]   # pinned pressure dof
    prob.fv_body_full = fv_full
    return prob


def _exact_fields(prob):
    coords = prob.space.p2_coords
    u = np.stack([coords[:, 1] ** 2, coords[:, 0] ** 2], 1).reshape(-1)
    pverts = prob.space.mesh.verts.sum(1)  # x + y
    return u, pverts


def test_stokes_manufactured_exact():
    prob = _manufactured_problem(n=6, with_convection=False)
    (v, p) = solve_steadystate_nse(prob, only_stokes=True, return_vp=True,
                                   verbose=False)
    uex, pex = _exact_fields(prob)
    assert np.allclose(v.ravel(), uex, atol=1e-10)
    # pressure defined up to the pinned dof: shift both to p[last]=0
    pfull = np.concatenate([p.ravel(), [0.0]])
    pex = pex - pex[-1]
    assert np.allclose(pfull, pex, atol=1e-9)


def test_nse_manufactured_exact():
    prob = _manufactured_problem(n=6, with_convection=True)
    (v, p), norms = solve_steadystate_nse(
        prob, return_vp=True, vel_nwtn_tol=1e-13, verbose=False,
        return_nwtnupd_norms=True,
    )
    uex, pex = _exact_fields(prob)
    assert np.allclose(v.ravel(), uex, atol=1e-9)
    pfull = np.concatenate([p.ravel(), [0.0]])
    assert np.allclose(pfull, pex - pex[-1], atol=1e-8)
    assert norms[-1] < 1e-13


def test_pfromv_reproduces_pressure():
    """Twin of the reference's tests/test_units_pfromv.py."""
    prob = _manufactured_problem(n=5, with_convection=True)
    (v, p) = solve_steadystate_nse(prob, return_vp=True, verbose=False,
                                   vel_nwtn_tol=1e-13)
    pfv = get_pfromv(v=v.ravel()[prob.invinds], prob=prob)
    assert np.allclose(pfv.ravel(), p.ravel(), atol=1e-8)


def test_driven_cavity_smoke():
    prob = drivencavity_problem(N=10, nu=1e-2)
    (v, p) = solve_steadystate_nse(prob, return_vp=True, verbose=False,
                                   vel_nwtn_tol=1e-12)
    # divergence-free in the discrete sense
    div = prob.Jc @ v.ravel()[prob.invinds]
    assert np.abs(div).max() < 1e-10
    assert np.isfinite(p).all()
    # lid velocity enforced
    assert np.isclose(v.ravel().reshape(-1, 2)[:, 0].max(), 1.0)


def test_pseudotime_matches_newton():
    """Pseudo-time marching reaches the Newton steady state (the CNAB
    increment's fixed point IS the steady NSE solution) — the scalable
    steady path for meshes beyond direct-solver sizes."""
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_pseudotime

    prob = drivencavity_problem(N=14, Re=40)
    v_newton = solve_steadystate_nse(prob, verbose=False,
                                     vel_nwtn_tol=1e-13)
    v_pt, info = solve_steadystate_pseudotime(
        prob, tol=2e-7, chunk=300, max_rounds=40, verbose=False,
        return_info=True)
    assert info["converged"], info["rates"][-3:]
    v_pt = np.asarray(v_pt).ravel()
    v_newton = np.asarray(v_newton).ravel()
    rel = np.linalg.norm(v_pt - v_newton) / np.linalg.norm(v_newton)
    assert rel < 5e-5, rel
