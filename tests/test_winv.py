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


def _blocktri_spd(rng, bs, nblk, coupling=0.05):
    """Random SPD block-tridiagonal F with fast off-diagonal inverse
    decay (diagonally dominant), plus its folded (nblk, bs, 3bs) form."""
    n = bs * nblk
    A = np.zeros((n, n))
    for k in range(nblk):
        d = rng.standard_normal((bs, bs)) * 0.02
        A[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs] = d + d.T
        if k + 1 < nblk:
            o = rng.standard_normal((bs, bs)) * coupling
            A[k * bs:(k + 1) * bs, (k + 1) * bs:(k + 2) * bs] = o
            A[(k + 1) * bs:(k + 2) * bs, k * bs:(k + 1) * bs] = o.T
    F = np.eye(n) * (1.0 + np.abs(A).sum(1).max()) + A
    Bblk = np.zeros((nblk, bs, 3 * bs), np.float32)
    for k in range(nblk):
        r = slice(k * bs, (k + 1) * bs)
        if k > 0:
            Bblk[k, :, :bs] = F[r, (k - 1) * bs:k * bs]
        Bblk[k, :, bs:2 * bs] = F[r, k * bs:(k + 1) * bs]
        if k + 1 < nblk:
            Bblk[k, :, 2 * bs:] = F[r, (k + 1) * bs:(k + 2) * bs]
    return F, Bblk


@pytest.mark.parametrize("nin_off", [0, 37])
def test_winv_localized_build_matches_dense_inverse(nin_off):
    """The LOCALIZED W build (each identity chunk solved on a ww+4bs
    local window — the lvl3 production path, sadpnt._build_winv_banded)
    must reproduce the dense inverse inside the window to far below the
    window-truncation level, on a problem where the local window is a
    PROPER subset of the space (nlocb < nblk) — the regime the
    full-solver tests cannot reach on CPU sizes (there ww covers nv).

    nin_off > 0 additionally exercises the padded tail (nin < nblk*bs):
    identity columns beyond nin must stay zero.
    """
    from dolfin_navier_scipy_tpu.solve.sadpnt import _build_winv_banded

    rng = np.random.default_rng(3)
    bs, nblk = 128, 12
    npad = bs * nblk
    nin = npad - nin_off
    F, Bblk = _blocktri_spd(rng, bs, nblk)
    dinv = 1.0 / np.diag(F)
    ww = 384
    ncpw = max(npad, ww)
    wbases = tuple(min(max(k * bs + (bs - ww) // 2, 0), ncpw - ww)
                   for k in range(nblk))
    nlocb = min(nblk, (ww + 4 * bs + bs - 1) // bs)
    assert nlocb < nblk  # genuinely localized windows
    W = np.asarray(_build_winv_banded(
        jnp.asarray(Bblk), dinv[:nin], bs, nblk, nin, wbases, ww, 80))

    # oracle: the PRINCIPAL submatrix inverse — padded rows/cols are
    # inert in the build (zero Jacobi weight and masked identity cols)
    Finv = np.zeros((npad, npad))
    Finv[:nin, :nin] = np.linalg.inv(F[:nin, :nin])
    err = trunc = 0.0
    for k in range(nblk):
        b = wbases[k]
        sl = Finv[k * bs:(k + 1) * bs, b:b + ww].copy()
        sl[:, max(nin - b, 0):] = 0.0       # padded-tail columns
        sl[max(nin - k * bs, 0):, :] = 0.0  # padded-tail rows
        Wk = W[k].copy()
        Wk[max(nin - k * bs, 0):, :] = 0.0
        err = max(err, np.abs(Wk - sl).max())
        out = np.abs(Finv[k * bs:(k + 1) * bs]).copy()
        out[:, b:b + ww] = 0.0
        trunc = max(trunc, out.max())
    # the build error must sit far below the window-truncation floor
    assert err < 1e-6, err
    assert trunc < 1e-4  # sanity: the synthetic decay suits the window


def test_winv_gates(saddle, monkeypatch):
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "0")
    assert SchurSaddleSolver(coeff=F, jmat=prob.Jc,
                             jmatT=prob.JTc).Wb is None
    # auto: the tiny cavity's F band fits cache — PCG path retained
    monkeypatch.setenv("DNS_TPU_WINV", "auto")
    assert SchurSaddleSolver(coeff=F, jmat=prob.Jc,
                             jmatT=prob.JTc).Wb is None


def test_winv_subproc_build_matches_local(saddle, monkeypatch):
    """The throwaway-subprocess W build (VERDICT r4 #4: the in-process
    build aborts the tunneled client at lvl3 shapes) must produce the
    SAME blocks as the in-process build — same localized PCG on the
    same inputs, just a clean device context + an npz round trip."""
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "1")
    monkeypatch.setenv("DNS_TPU_WINV_BUILD", "local")
    slv_loc = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc)
    monkeypatch.setenv("DNS_TPU_WINV_BUILD", "subproc")
    slv_sub = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc)
    assert slv_loc.Wb is not None and slv_sub.Wb is not None
    wl, ws = np.asarray(slv_loc.Wb), np.asarray(slv_sub.Wb)
    assert wl.shape == ws.shape
    assert np.allclose(wl, ws, rtol=0, atol=1e-6 * np.abs(wl).max())


def test_lowbit_pair_storage(saddle, monkeypatch):
    """Low-bit factor storage (DNS_TPU_LOWBIT=1): W/X become bf16
    hi/lo row-pairs, S^-1 a bf16 hi/lo stack.  Two invariants:

    * the lo half must be NONZERO — XLA's excess-precision folding
      elides the f32->bf16->f32 roundtrip inside one jitted program
      (observed on the TPU backend 2026-08-21), which silently
      degrades the pair to single-bf16 (~4e-3); _pair_stack carries an
      optimization_barrier against exactly this;
    * with one refine round the solve must stay at the f32-grade
      floor (hi-only predictor rounding and window truncation both
      absorbed)."""
    prob, F, bv, bp, ref = saddle
    monkeypatch.setenv("DNS_TPU_WINV", "1")
    monkeypatch.setenv("DNS_TPU_LOWBIT", "1")
    slv = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc)
    assert slv.Wb.dtype == jnp.bfloat16
    assert slv.Wb.shape[1] == 3 * slv._bs   # W carries 3 bf16 levels
    bs = slv._bs
    lo_mag = float(jnp.abs(slv.Wb[:, bs:].astype(jnp.float32)).max())
    hi_mag = float(jnp.abs(slv.Wb[:, :bs].astype(jnp.float32)).max())
    assert lo_mag > 1e-4 * hi_mag, "pair lo half elided (XLA folding)"
    s2_mag = float(jnp.abs(
        slv.Sinv[slv.np:].astype(jnp.float32)).max())
    s1_mag = float(jnp.abs(
        slv.Sinv[: slv.np].astype(jnp.float32)).max())
    assert s2_mag > 1e-4 * s1_mag, "Sinv lo half elided (XLA folding)"
    for refine, tol in ((0, 5e-3), (1, 2e-6)):
        slv.refine = refine
        out = np.asarray(slv.solve(jnp.asarray(bv), jnp.asarray(bp)))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < tol, (refine, rel)
