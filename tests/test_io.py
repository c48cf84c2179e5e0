"""I/O utilities: persistence, memoization, signals, paraview output."""

import json
import os

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.utils import io as dou


def test_npa_roundtrip(tmp_path):
    v = np.random.rand(17, 1)
    f = str(tmp_path / "vec")
    dou.save_npa(v, f)
    assert np.allclose(dou.load_npa(f), v)


def test_spa_roundtrip(tmp_path):
    import scipy.sparse as sps

    m = sps.random(8, 9, density=0.3, format="csr")
    f = str(tmp_path / "mat")
    dou.save_spa(m, f)
    assert abs(dou.load_spa(f) - m).max() < 1e-15


def test_load_or_comp(tmp_path):
    calls = []

    def comp():
        calls.append(1)
        return np.arange(5.0)

    f = str(tmp_path / "memo")
    a = dou.load_or_comp(filestr=f, comprtn=comp, verbose=False)
    b = dou.load_or_comp(filestr=f, comprtn=comp, verbose=False)
    assert np.allclose(a, b) and len(calls) == 1


def test_output_json_and_measure(tmp_path):
    f = str(tmp_path / "sig.json")
    tmesh = [0.0, 0.5, 1.0]
    sig = [[0.0], [1.0], [2.0]]
    dou.save_output_json(dict(tmesh=tmesh, outsig=sig), fstring=f)
    with open(f) as fh:
        d = json.load(fh)
    assert d["datadict"]["outsig"] == sig
    err = dou.meas_output_diff(sig, tmesh, lambda t: np.array([2 * t]))
    assert err >= 0


def test_timer_and_datastr():
    info = {}
    with dou.Timer("t1", timerinfo=info, verbose=False):
        _ = sum(range(1000))
    assert info["t1"] > 0
    s = dou.get_datastr(time=1.0, meshp=2, nu=1e-3, Nts=10, semiexpl=True)
    # reference format (get_datastr_snu, stokes_navier_utils.py:21-30)
    assert s == "time1.00000e+00_nu1.000e-03_mesh2_Nts10_semexp"
    # nu=None must not collapse the key (mesh/Nts still distinguish runs)
    s2 = dou.get_datastr(time=1.0, meshp=2, nu=None, Nts=10)
    assert "nuNone" in s2 and "mesh2" in s2 and "Nts10" in s2


def test_pvd_writer(tmp_path):
    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.utils.vtk import PVDWriter

    for scheme, gs in (("TH", True), ("CR", False)):
        prob = drivencavity_problem(N=4, nu=1e-2, scheme=scheme,
                                    gradvsymmtrc=gs)
        pref = str(tmp_path / f"flow_{scheme}")
        w = PVDWriter(pref, prob)
        v = np.random.rand(prob.nv_full)
        p = np.random.rand(prob.np_cond)
        w.write(v_full=v, p=p, t=0.0)
        w.write(v_full=v, p=p, t=0.5)
        w.close()
        assert os.path.exists(pref + ".pvd")
        assert os.path.exists(pref + "_000000.vtu")
        txt = open(pref + ".pvd").read()
        assert txt.count("DataSet") == 2


def test_timer_trace_annotation(tmp_path):
    """Timer's jax.profiler hooks: trace capture writes a profile dir
    (SURVEY section 5.1 names jax.profiler as the tracing upgrade)."""
    import os

    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.utils.io import Timer

    td = str(tmp_path / "trace")
    with Timer("traced-op", trace_dir=td, annotate=True, verbose=False):
        jnp.ones((64, 64)).sum().block_until_ready()
    assert os.path.isdir(td) and os.listdir(td)
