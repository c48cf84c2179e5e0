"""Krylov saddle solves (the reference's krypy-GMRES option)."""

import numpy as np

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import solve_sadpnt
from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host


def test_gmres_matches_direct():
    prob = drivencavity_problem(N=6, nu=1e-2)
    rng = np.random.default_rng(9)
    rhsv = rng.normal(size=len(prob.invinds))
    stats = []
    x_kry = solve_sadpnt(amat=prob.Mc, jmat=prob.Jc, jmatT=prob.JTc,
                         rhsv=rhsv, krylov="gmres",
                         krpslvprms=dict(tol=1e-12, maxiter=400,
                                         restart=200, convstatsl=stats))
    x_dir = solve_sadpnt_host(amat=prob.Mc, jmat=prob.Jc, jmatT=prob.JTc,
                              rhsv=rhsv)
    assert len(stats) > 0 and stats[-1] < 1e-10
    assert np.allclose(x_kry, x_dir, atol=1e-7)
