"""In-scan per-step lift/drag/pressure-drop observables.

Validates models/functionals.make_inscan_liftdrag: (a) in the steady
limit the per-step coefficients reproduce the steady residual-trick
evaluator on the same mesh; (b) on a genuinely unsteady run every
emitted value equals the host recomputation of the same consistent-flux
formula from the saved trajectory (the "double bookkeeping" pattern of
the reference's residual tests, tests/test_units_residuals.py).
"""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
    pressure_drop,
)
from dolfin_navier_scipy_tpu.models.functionals import make_inscan_liftdrag
from dolfin_navier_scipy_tpu.solve import cnab, solve_steadystate_nse

CHARVEL = 0.2


@pytest.fixture(scope="module")
def wake():
    prob = cylinderwake_problem(level=0, nu=1e-3, charvel=CHARVEL)
    (v, p), _ = solve_steadystate_nse(
        prob, return_vp=True, verbose=False, vel_pcrd_stps=2,
        vel_nwtn_stps=8, vel_nwtn_tol=1e-11, return_nwtnupd_norms=True,
    )
    return prob, np.asarray(v).ravel(), np.asarray(p).ravel()


def _embed(prob, vin):
    vf = np.asarray(prob.bc_full_vec()).copy()
    vf[prob.invinds] = np.asarray(vin)
    return vf


def test_steady_limit_matches_steady_evaluator(wake):
    prob, vfull, p = wake
    dt = 1e-3
    trange = np.linspace(0, 12 * dt, 13)
    outfunc, ob = make_inscan_liftdrag(prob, dt, charvel=CHARVEL)
    out = cnab(trange=trange, prob=prob, inivel=vfull[prob.invinds],
               save_every=None, outfunc=outfunc, out_bundle=ob)
    assert not out["ffflag"]
    outs = np.asarray(out["outs"])
    assert outs.shape == (11, 3)   # scan covers trange[2:]

    ld = LiftDragSurfForce(prob)
    cl_s, cd_s = ld.coefficients(vfull, p, charvel=CHARVEL, charlen=0.1)
    dp_s = pressure_drop(prob, p)
    cl, cd, dp = outs[-1]
    assert abs(cd - cd_s) / abs(cd_s) < 2e-3, (cd, cd_s)
    assert abs(cl - cl_s) < 2e-3, (cl, cl_s)
    assert abs(dp - dp_s) / abs(dp_s) < 2e-3, (dp, dp_s)
    # steady in time: the M dv/dt contribution must not drift the series
    assert np.abs(outs[2:] - outs[-1]).max() < 1e-3


def test_inscan_equals_host_recompute(wake):
    prob, vfull, p = wake
    rng = np.random.default_rng(11)
    v0 = vfull[prob.invinds] * (1 + 0.05 * rng.normal(
        size=len(prob.invinds)))
    dt = 5e-4
    n = 9
    trange = np.linspace(0, n * dt, n + 1)
    outfunc, ob = make_inscan_liftdrag(prob, dt, charvel=CHARVEL)
    out = cnab(trange=trange, prob=prob, inivel=v0, save_every=1,
               outfunc=outfunc, out_bundle=ob)
    vs = np.asarray(out["vs"])          # (n-1, nin) states per scan step
    ps = np.asarray(out["ps"])
    outs = np.asarray(out["outs"])      # (n-1, 3)

    Mf, Af, JTf = prob.full["M"], prob.full["A"], prob.full["JT"]
    lds = np.asarray(prob.ldsbcinds)
    xd, yd = lds[lds % 2 == 0], lds[lds % 2 == 1]
    fac = 2.0 / (0.1 * CHARVEL ** 2)
    fvf = np.asarray(prob.fv_body_full).ravel()

    for k in (2, 4, len(vs) - 1):
        vk, vc, vp_ = (_embed(prob, vs[k]), _embed(prob, vs[k - 1]),
                       _embed(prob, vs[k - 2]))
        conv_c = np.asarray(prob.conv_kernel.vector(vc)).ravel()
        conv_p = np.asarray(prob.conv_kernel.vector(vp_)).ravel()
        pfull = (ps[k] if prob.geo.ppin is None
                 else np.concatenate([ps[k], [0.0]]))
        R = (Mf @ ((vk - vc) / dt) + Af @ (0.5 * (vk + vc))
             + 0.5 * (3 * conv_c - conv_p) - JTf @ pfull - fvf)
        cd_h = -fac * R[xd].sum()
        cl_h = -fac * R[yd].sum()
        dp_h = pressure_drop(prob, ps[k])
        cl, cd, dp = outs[k]
        scale = max(1.0, abs(cd_h))
        assert abs(cd - cd_h) / scale < 5e-4, (k, cd, cd_h)
        assert abs(cl - cl_h) / max(1.0, abs(cl_h)) < 5e-4, (k, cl, cl_h)
        assert abs(dp - dp_h) < 5e-4, (k, dp, dp_h)
