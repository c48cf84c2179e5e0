"""Import-smoke every example driver (the reference ships its drivers
as runnable tests/*.py scripts; ours live in examples/ with __main__
guards).  Importing catches bit-rot — renamed library symbols, moved
modules, syntax errors — without paying for a full run.

``mini_setup.py`` executes its workflow at import (it IS the
quickstart, twin of reference tests/mini_setup.py) and is exercised
separately with a real solve.
"""

import importlib.util
import pathlib
import sys

import pytest

EXDIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
GUARDED = sorted(p.name for p in EXDIR.glob("*.py")
                 if p.name != "mini_setup.py")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name[:-3]}", EXDIR / name)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(spec.name, None)
    return mod


def test_example_inventory():
    # the reference's driver set is mirrored; a shrinking inventory is
    # a regression, not a cleanup
    assert len(GUARDED) >= 19, GUARDED


@pytest.mark.parametrize("name", GUARDED)
def test_example_imports(name):
    mod = _load(name)
    # every driver exposes at least one callable entry point
    assert any(callable(getattr(mod, a)) for a in dir(mod)
               if not a.startswith("_")), name


def test_mini_setup_runs():
    """The quickstart executes end-to-end at import and leaves a
    coherent steady solution in scope (v_ss/p_ss cross-check happens
    inside the script)."""
    mod = _load("mini_setup.py")
    import numpy as np

    v = np.asarray(mod.v).ravel()
    p = np.asarray(mod.p).ravel()
    pfv = np.asarray(mod.pfv).ravel()
    assert np.all(np.isfinite(v))
    assert np.linalg.norm(pfv - p) / np.linalg.norm(p) < 1e-6
