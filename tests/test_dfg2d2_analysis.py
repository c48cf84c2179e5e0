"""Shedding analysis used by the DFG 2D-2 driver: Strouhal frequency,
per-period extrema and the half-period pressure drop on synthetic
series with known ground truth."""

import importlib.util
import pathlib

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "dfg2d2", pathlib.Path(__file__).parent.parent
    / "examples" / "time_dep_nse_dfg2D2.py")
dfg2d2 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dfg2d2)


def test_analyze_synthetic_shedding():
    f = 3.03                      # Hz -> St = 0.1 f / U = 0.303
    t = np.arange(0, 8.0, 1e-3)
    cl = 1.0 * np.sin(2 * np.pi * f * t)
    cd = 3.23 + 0.05 * np.sin(4 * np.pi * f * t)   # drag at double freq
    dp = 2.48 + 0.1 * np.cos(2 * np.pi * f * t)
    res = dfg2d2.analyze_shedding(t, cl, cd, dp, measure_last=2.0)
    assert abs(res["St"] - 0.303) < 1e-3, res
    assert abs(res["clmax"] - 1.0) < 1e-3
    assert abs(res["cdmax"] - 3.28) < 1e-3
    # dp at half a period after the cl peak: phase pi/2 + pi -> cos = 0
    assert abs(res["dp_half"] - 2.48) < 2e-3
    assert res["n_periods"] >= 5


def test_analyze_no_shedding_is_nan():
    t = np.linspace(0, 1, 300)
    flat = np.full_like(t, 2.0)
    res = dfg2d2.analyze_shedding(t, flat, flat, flat, measure_last=0.5)
    assert np.isnan(res["St"])
