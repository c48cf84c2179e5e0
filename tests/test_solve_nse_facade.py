"""solve_nse orchestrator facade: Stokes init, vp-dicts, file-backed
trajectories, paraview output (reference stokes_navier_utils.py:548)."""

import os

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import solve_nse
from dolfin_navier_scipy_tpu.utils.io import load_npa


@pytest.fixture(scope="module")
def prob():
    return drivencavity_problem(N=6, nu=1e-2)


def test_start_ssstokes_and_vpdict(prob, tmp_path_factory):
    out = solve_nse(prob=prob, t0=0.0, tE=0.1, Nts=20,
                    start_ssstokes=True, save_every=5,
                    return_vp_dict=True)
    assert not out["ffflag"]
    assert len(out["vp_dict"]) == 3            # 18 scanned steps // 5
    for t, d in out["vp_dict"].items():
        assert d["v"].shape == (len(prob.invinds),)
        assert d["p"].shape == (prob.np_cond,)


def test_dictofvelstrs_roundtrip(prob, tmp_path):
    out = solve_nse(prob=prob, t0=0.0, tE=0.1, Nts=20,
                    start_ssstokes=True, save_every=5,
                    return_dictofvelstrs=True,
                    data_prfx=str(tmp_path / "traj"))
    dvs = out["dictofvelstrs"]
    assert len(dvs) == 3
    t_last = max(dvs)
    v = load_npa(dvs[t_last])
    assert np.allclose(v, np.asarray(out["vs"][-1]))


def test_paraview_output(prob, tmp_path):
    out = solve_nse(prob=prob, t0=0.0, tE=0.05, Nts=10,
                    start_ssstokes=True, save_every=4,
                    paraviewoutput=True,
                    vfileprfx=str(tmp_path / "flow"))
    assert os.path.exists(out["pvdfile"])


def test_sbdf2_dispatch(prob):
    out = solve_nse(prob=prob, t0=0.0, tE=0.05, Nts=10,
                    start_ssstokes=True, time_int_scheme="sbdf2",
                    save_every=None)
    assert not out["ffflag"]


def test_stokes_flow_mode(prob):
    """stokes_flow=True drops the convection entirely (reference
    kwarg); a Stokes steady state then stays fixed exactly."""
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    vst, pst = solve_steadystate_nse(prob, only_stokes=True,
                                     return_vp=True, verbose=False)
    out = solve_nse(prob=prob, t0=0.0, tE=0.1, Nts=20,
                    iniv=vst.ravel()[prob.invinds], stokes_flow=True,
                    save_every=None)
    assert np.abs(np.asarray(out["v"])
                  - vst.ravel()[prob.invinds]).max() < 1e-9
