"""Banded truncated inverse W ~ F^{-1} (the direct velocity-block solve).

W replaces the fixed-count Jacobi-PCG inside the banded block-Schur
solve with ONE wide static-window banded matvec
(sadpnt.SchurSaddleSolver._wapply); its solve tolerance is the
truncation threshold (~1e-5-1e-6) instead of the warm PCG's ~2e-4, and
the refine rounds absorb the truncation quadratically.  The default is
size-gated (F band > ~VMEM) — these tests force it on/off explicitly.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve.sadpnt import (
    SchurSaddleSolver, host_saddle_factorized)


@pytest.fixture(scope="module")
def saddle():
    prob = drivencavity_problem(N=8, nu=1e-2)
    dt = 1e-3
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    rng = np.random.default_rng(0)
    bv = rng.standard_normal(F.shape[0])
    bp = rng.standard_normal(prob.Jc.shape[0])
    ref = host_saddle_factorized(F, prob.Jc, prob.JTc)(bv, bp).ravel()
    return prob, F, bv, bp, ref


def test_winv_solve_accuracy(saddle, monkeypatch):
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "1")
    monkeypatch.setenv("DNS_TPU_WINV_TOL", "1e-5")
    slv = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc)
    assert slv.Wb is not None
    for refine, tol in ((0, 2e-5), (1, 5e-7)):
        slv.refine = refine
        out = np.asarray(slv.solve(jnp.asarray(bv), jnp.asarray(bp)))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < tol, (refine, rel)


def test_winv_loose_default_refine_absorbs(saddle, monkeypatch):
    """The production default wtol=3e-3 imprints ~wtol on the one-shot
    solve; ONE refine round absorbs the truncation (the measured basis
    of the default — docs/PERF_NOTES.md section 14)."""
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "1")
    slv = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc)
    assert slv.Wb is not None
    for refine, tol in ((0, 5e-3), (1, 5e-6)):
        slv.refine = refine
        out = np.asarray(slv.solve(jnp.asarray(bv), jnp.asarray(bp)))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < tol, (refine, rel)


def test_winv_gates(saddle, monkeypatch):
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "0")
    assert SchurSaddleSolver(coeff=F, jmat=prob.Jc,
                             jmatT=prob.JTc).Wb is None
    # auto: the tiny cavity's F band fits cache — PCG path retained
    monkeypatch.setenv("DNS_TPU_WINV", "auto")
    assert SchurSaddleSolver(coeff=F, jmat=prob.Jc,
                             jmatT=prob.JTc).Wb is None
