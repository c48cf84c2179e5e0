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


def test_checkpoint_resume_exact(prob, tmp_path):
    """Kill-and-resume reproduces the uninterrupted trajectory EXACTLY:
    checkpoints store the full scan carry (the reference re-bootstraps
    from the last stored state, stokes_navier_utils.py:950-1070, and is
    only O(dt^2)-consistent across the restart)."""
    kw = dict(prob=prob, t0=0.0, tE=0.1, Nts=20, start_ssstokes=True,
              save_every=5)
    ref = solve_nse(**kw)

    # full run with checkpointing every 5 steps
    prfx = str(tmp_path / "ck")
    out = solve_nse(save_data=True, checkpoint_every=5,
                    data_prfx=prfx, **kw)
    # sectioning changes only the decimation grid, not the dynamics:
    # final states agree exactly
    assert np.allclose(np.asarray(out["v"]), np.asarray(ref["v"]),
                       rtol=0, atol=1e-13)

    # simulate a crash: delete the later checkpoints, resume from t=0.05
    import glob as _glob

    cks = sorted(_glob.glob(prfx + "*__carry.npz"), key=os.path.getmtime)
    assert len(cks) == 4                      # steps 5, 10, 15, 20
    for f in cks[2:]:
        os.remove(f)
    res = solve_nse(useolddata=True, save_data=True, checkpoint_every=5,
                    data_prfx=prfx, **kw)
    assert res.get("resumed_from") is None    # resumed mid-way, re-ran tail
    assert np.allclose(np.asarray(res["v"]), np.asarray(ref["v"]),
                       rtol=0, atol=1e-13)
    # the resumed tail reproduces the uninterrupted (same-grid) run's
    # decimated trajectory exactly
    assert np.allclose(np.asarray(res["vs"][-2:]), np.asarray(out["vs"][-2:]),
                       rtol=0, atol=1e-14)

    # resume with everything present: returns the final state directly
    res2 = solve_nse(useolddata=True, data_prfx=prfx, **kw)
    assert res2["resumed_from"] == 0.1
    assert np.allclose(np.asarray(res2["v"]), np.asarray(ref["v"]),
                       rtol=0, atol=1e-13)

    # clearprvdata wipes the store
    solve_nse(clearprvdata=True, data_prfx=prfx, **kw)
    assert not _glob.glob(prfx + "*__carry.npz")


def test_checkpoint_resume_controlled(tmp_path):
    """Disk checkpoints cover closed-loop runs: the control memories and
    boundary values (``cmems``/``cvals``) are serialized inside the scan
    carry, so a ``useolddata`` resume with a stateful DirichletControl
    reproduces the uninterrupted trajectory exactly (the reference caches
    controlled runs too, stokes_navier_utils.py:950-1070)."""
    import glob as _glob

    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.solve import (DirichletControl,
                                               solve_steadystate_nse)

    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2,
                                movingwallcntrl=True)
    dofs, stencil = prob.dircntrl[0]
    vss = solve_steadystate_nse(prob, verbose=False, vel_pcrd_stps=2,
                                vel_nwtn_stps=5, vel_nwtn_tol=1e-10)
    v0 = vss.ravel()[prob.invinds]

    def ufunc(t, v_full, p, memory, mode):
        # stateful rotation rate: the carried memory MUST survive the
        # checkpoint round-trip for the resumed run to match
        memory = memory + 0.05
        return jnp.sin(20.0 * t) * jnp.cos(memory), memory

    def mkctrl():
        return DirichletControl(dofs=dofs, stencil=stencil, ufunc=ufunc,
                                memory=jnp.asarray(0.0))

    kw = dict(prob=prob, t0=0.0, tE=0.05, Nts=20, iniv=v0, save_every=5)
    ref = solve_nse(controls=[mkctrl()], **kw)
    assert not ref["ffflag"]

    prfx = str(tmp_path / "ctl")
    out = solve_nse(controls=[mkctrl()], save_data=True,
                    checkpoint_every=5, data_prfx=prfx, **kw)
    assert np.allclose(np.asarray(out["v"]), np.asarray(ref["v"]),
                       rtol=0, atol=1e-13)

    # crash after step 10: drop the later checkpoints, resume
    cks = sorted(_glob.glob(prfx + "*__carry.npz"), key=os.path.getmtime)
    assert len(cks) == 4
    for f in cks[2:]:
        os.remove(f)
    res = solve_nse(controls=[mkctrl()], useolddata=True, save_data=True,
                    checkpoint_every=5, data_prfx=prfx, **kw)
    assert np.allclose(np.asarray(res["v"]), np.asarray(ref["v"]),
                       rtol=0, atol=1e-13)
    assert np.allclose(np.asarray(res["vs"][-2:]),
                       np.asarray(out["vs"][-2:]), rtol=0, atol=1e-14)
