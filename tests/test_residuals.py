"""Double-entry bookkeeping tests: the device-side integrator updates
must zero the independently (host-)assembled weak-form IMEX residuals —
the twin of the reference's tests/test_units_residuals.py:92-134."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.residual_checks import (
    get_imex_res,
    get_steady_state_res,
    prjctd_steadystate_res,
)
from dolfin_navier_scipy_tpu.solve import cnab, solve_steadystate_nse


@pytest.fixture(scope="module")
def setup():
    prob = drivencavity_problem(N=7, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-13)
    rng = np.random.default_rng(11)
    v0 = vss.ravel()[prob.invinds] * (1 + 0.02)
    trange = np.linspace(0, 0.02, 5)
    out = cnab(trange=trange, prob=prob, inivel=v0, save_every=1,
               predictor="IMEX-Euler")
    return prob, v0, trange, out, vss


def _full(prob, v_inner):
    return np.asarray(prob.embed(v_inner))


def test_heunpred_euler_residual(setup):
    prob, v0, trange, out, _ = setup
    dt = trange[1] - trange[0]
    bs = out["bootstrap"]
    res = get_imex_res(prob, dt, scheme="eule")
    r = res(_full(prob, v0), _full(prob, np.asarray(bs["v_pred"])),
            np.asarray(bs["p_pred"]))
    assert np.abs(r).max() < 1e-11, np.abs(r).max()


def test_heuncorr_residual(setup):
    prob, v0, trange, out, _ = setup
    dt = trange[1] - trange[0]
    bs = out["bootstrap"]
    res = get_imex_res(prob, dt, scheme="heun")
    r = res(_full(prob, v0), _full(prob, np.asarray(bs["v_pred"])),
            _full(prob, np.asarray(bs["v"])), np.asarray(bs["p"]))
    assert np.abs(r).max() < 1e-11, np.abs(r).max()


def test_abtwo_residual(setup):
    prob, v0, trange, out, _ = setup
    dt = trange[1] - trange[0]
    bs = out["bootstrap"]
    v2 = np.asarray(out["vs"][0])     # state after the first AB2 step
    p2 = np.asarray(out["ps"][0])
    res = get_imex_res(prob, dt, scheme="abtw")
    r = res(_full(prob, v0), _full(prob, np.asarray(bs["v"])),
            _full(prob, v2), p2)
    assert np.abs(r).max() < 1e-11, np.abs(r).max()


def test_steady_state_residual_vanishes(setup):
    prob, _, _, _, vss = setup
    (v, p) = solve_steadystate_nse(prob, return_vp=True, verbose=False,
                                   vel_nwtn_tol=1e-13)
    res = get_steady_state_res(prob)
    R = res(v.ravel(), p.ravel())
    assert np.abs(R[prob.invinds]).max() < 1e-10
    prj = prjctd_steadystate_res(prob, v.ravel())
    # projecting out the pressure leaves the convection+diffusion residual
    # balanced by the (projected-out) pressure gradient: compare with p in
    R2 = res(v.ravel(), p.ravel())
    assert np.abs(R2[prob.invinds]).max() < 1e-10
