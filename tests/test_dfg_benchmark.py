"""DFG 2D-1 benchmark regression (Schaefer/Turek, Re=20).

Twin of the reference's tests/steadystate_schaefer-turek_2D-1.py: the
steady cylinder-wake coefficients against the published featflow values

    Cd = 5.57953523384,  Cl = 0.010618948146,  DeltaP = 0.11752016697.

On the native level-1 mesh we verify to ~0.5% (drag/pressure) — the same
ballpark the reference achieves on its lvl1 gmsh mesh; mesh-refinement
convergence toward the published values is checked in the (slower)
level-2 variant of the benchmark driver, not here.
"""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
    pressure_drop,
)
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

CD_REF = 5.57953523384
CL_REF = 0.010618948146
DP_REF = 0.11752016697


@pytest.fixture(scope="module")
def dfg_solution():
    prob = cylinderwake_problem(level=1, nu=1e-3, charvel=0.2)
    (v, p), norms = solve_steadystate_nse(
        prob, return_vp=True, verbose=False, vel_pcrd_stps=2,
        vel_nwtn_stps=8, vel_nwtn_tol=1e-12, return_nwtnupd_norms=True,
    )
    return prob, v, p, norms


def test_newton_converged(dfg_solution):
    _, _, _, norms = dfg_solution
    assert norms[-1] < 1e-12


def test_dfg_coefficients(dfg_solution):
    prob, v, p, _ = dfg_solution
    ld = LiftDragSurfForce(prob)
    cl, cd = ld.coefficients(v, p, charvel=0.2, charlen=0.1)
    assert abs(cd - CD_REF) / CD_REF < 0.005, cd
    assert abs(cl - CL_REF) < 2e-3, cl   # lift is tiny and mesh-sensitive


def test_dfg_pressure_drop(dfg_solution):
    prob, v, p, _ = dfg_solution
    dp = pressure_drop(prob, p)
    assert abs(dp - DP_REF) / DP_REF < 0.01, dp


def test_divergence_free(dfg_solution):
    prob, v, p, _ = dfg_solution
    div = prob.Jc @ np.asarray(v).ravel()[prob.invinds]
    rhs = np.asarray(prob.fp).ravel()
    assert np.abs(div - rhs).max() < 1e-9
