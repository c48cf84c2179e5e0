"""Krylov saddle solves (the reference's krypy-GMRES option)."""

import numpy as np

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import solve_sadpnt
from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host


def test_gmres_matches_direct():
    prob = drivencavity_problem(N=6, nu=1e-2)
    rng = np.random.default_rng(9)
    rhsv = rng.normal(size=len(prob.invinds))
    stats = []
    x_kry = solve_sadpnt(amat=prob.Mc, jmat=prob.Jc, jmatT=prob.JTc,
                         rhsv=rhsv, krylov="gmres",
                         krpslvprms=dict(tol=1e-12, maxiter=400,
                                         restart=200, convstatsl=stats))
    x_dir = solve_sadpnt_host(amat=prob.Mc, jmat=prob.Jc, jmatT=prob.JTc,
                              rhsv=rhsv)
    assert len(stats) > 0 and stats[-1] < 1e-10
    assert np.allclose(x_kry, x_dir, atol=1e-7)


def test_krylov_cnab_matches_dense():
    """CNAB with the matrix-free Krylov saddle solver matches the dense
    path (the large-mesh configuration)."""
    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.solve import cnab, solve_steadystate_nse
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    prob = drivencavity_problem(N=8, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = vss.ravel()[prob.invinds]
    trange = np.linspace(0, 0.1, 41)
    fvb = jnp.asarray(np.asarray(prob.fv).ravel())
    pert = jnp.asarray(np.cos(np.arange(len(prob.invinds)) * 0.13))
    f_tdp = lambda t: fvb + 0.1 * jnp.sin(7 * t) * pert  # noqa: E731
    od = cnab(trange=trange, prob=prob, inivel=v0, f_tdp=f_tdp,
              save_every=None)
    ok_ops = _build_ops(prob, float(trange[1] - trange[0]), theta=0.5,
                        linsolver="krylov")
    ok = cnab(trange=trange, prob=prob, inivel=v0, f_tdp=f_tdp,
              ops=ok_ops, save_every=None)
    rel = (np.linalg.norm(np.asarray(ok["v"]) - np.asarray(od["v"]))
           / np.linalg.norm(np.asarray(od["v"])))
    assert rel < 1e-8, rel


def test_smw_krylov_matches_dense():
    """Low-rank update on the iterative path (was NotImplementedError):
    gmres with A - umat@vmat matches the dense SMW solve."""
    import numpy as np

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt

    prob = drivencavity_problem(N=6, nu=1e-2)
    nin = len(prob.invinds)
    rng = np.random.default_rng(3)
    umat = 1e-2 * rng.standard_normal((nin, 2))
    vmat = 1e-2 * rng.standard_normal((2, nin))
    rhsv = np.asarray(prob.fv).ravel()
    x_dense = solve_sadpnt(amat=prob.Ac, jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=rhsv, umat=umat, vmat=vmat)
    x_kry = solve_sadpnt(amat=prob.Ac, jmat=prob.Jc, jmatT=prob.JTc,
                         rhsv=rhsv, umat=umat, vmat=vmat,
                         krylov="gmres",
                         krpslvprms=dict(tol=1e-13, maxiter=600))
    assert np.allclose(x_kry.ravel(), x_dense.ravel(), atol=1e-8)


def test_schur_refine_recovers_accuracy():
    """SchurSaddleSolver refine rounds (residual scaled to O(1) before
    the correction solve) tighten the solve beyond the PCG tolerance."""
    import numpy as np
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve.sadpnt import SchurSaddleSolver

    prob = drivencavity_problem(N=8, nu=1e-2)
    dt = 1e-3
    coeff = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    nin, npp = len(prob.invinds), prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(coeff), sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc), sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    rng = np.random.default_rng(1)
    bv = rng.standard_normal(nin)
    x_ref = lu.solve(np.concatenate([bv, np.zeros(npp)]))

    # deliberately loose PCG so the refine round has work to do
    s0 = SchurSaddleSolver(coeff, prob.Jc, prob.JTc, ncg=8, refine=0)
    s1 = SchurSaddleSolver(coeff, prob.Jc, prob.JTc, ncg=8, refine=2)
    e0 = np.linalg.norm(np.asarray(
        s0.solve(jnp.asarray(bv), jnp.zeros(npp))) - x_ref)
    e1 = np.linalg.norm(np.asarray(
        s1.solve(jnp.asarray(bv), jnp.zeros(npp))) - x_ref)
    assert e1 < 1e-3 * e0, (e0, e1)


def test_krylov_cnab_midsize_with_telemetry():
    """The Krylov saddle path at a real FEM size (lvl1 cylinder wake,
    8k dofs — the designated beyond-dense-range fallback, VERDICT r2
    weak #7): trajectory matches the dense-inverse path, and the
    in-scan true-residual telemetry (``solve_res``) stays at the
    preconditioned-GMRES level over the whole horizon."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.solve import cnab, solve_steadystate_nse
    from dolfin_navier_scipy_tpu.solve.krylov_saddle import build_krylov_ops
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    prob = cylinderwake_problem(level=1, nu=1e-3, charvel=0.2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11)
    v0 = vss.ravel()[prob.invinds]
    trange = np.linspace(0, 0.05, 26)
    dt = float(trange[1] - trange[0])
    od = cnab(trange=trange, prob=prob, inivel=v0, save_every=None)
    ok_ops = build_krylov_ops(prob, dt, tol=1e-10, maxiter=6)
    ok = cnab(trange=trange, prob=prob, inivel=v0, ops=ok_ops,
              save_every=None)
    rel = (np.linalg.norm(np.asarray(ok["v"]) - np.asarray(od["v"]))
           / np.linalg.norm(np.asarray(od["v"])))
    assert rel < 1e-7, rel

    # in-scan telemetry: scan over repeated increment-sized solves,
    # carrying the per-step true residual out of the compiled loop
    solver = ok_ops.solver
    nin, npp = len(prob.invinds), prob.np_cond
    rhs0 = dt * jnp.asarray(np.asarray(prob.fv).ravel())

    @jax.jit
    def sweep(rhs):
        def body(c, k):
            x, res = solver.solve_res(rhs * (1.0 + 1e-3 * k),
                                      jnp.zeros((npp,)))
            return c, res

        return lax.scan(body, 0.0, jnp.arange(8.0))[1]

    res = np.asarray(sweep(rhs0))
    assert res.shape == (8,)
    assert np.all(res < 1e-8), res


def test_banded_matvec_exact_and_solver_equivalent(monkeypatch):
    """The RCM-banded block-tridiagonal F form (sadpnt._build_banded /
    _banded_mv — the gather-free PCG matvec, 2x the element pipeline
    in-scan on TPU, docs/PERF_NOTES.md) is (a) an exact f32 matvec of
    F and (b) interchangeable with the element pipeline inside
    SchurSaddleSolver to the PCG tolerance."""
    import numpy as np
    import scipy.sparse as sps

    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve.sadpnt import (
        SchurSaddleSolver, _banded_mv, _build_banded)

    prob = drivencavity_problem(N=8, nu=1e-2)
    dt = 1e-3
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    n = F.shape[0]

    blocks, perm, bs, nblk = _build_banded(F)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    # matvec in permuted space vs scipy (f32 data, f32-exact contraction)
    Fp = sps.csr_matrix(F[perm][:, perm]).astype(np.float32)
    y_ref = Fp @ x
    y = np.asarray(_banded_mv(jnp.asarray(blocks), jnp.asarray(x),
                              bs, nblk, n))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-6

    # solver equivalence: banded-on vs banded-off agree to the solve tol
    bv = rng.standard_normal(n)
    zp = jnp.zeros((prob.np_cond,))
    monkeypatch.setenv("DNS_TPU_BANDED", "1")
    sb = SchurSaddleSolver(F, prob.Jc, prob.JTc, ncg=40)
    assert sb.Bblk is not None
    monkeypatch.setenv("DNS_TPU_BANDED", "0")
    se = SchurSaddleSolver(F, prob.Jc, prob.JTc, ncg=40)
    assert se.Bblk is None
    xb = np.asarray(sb.solve(jnp.asarray(bv), zp))
    xe = np.asarray(se.solve(jnp.asarray(bv), zp))
    assert np.linalg.norm(xb - xe) / np.linalg.norm(xe) < 1e-4, (
        np.linalg.norm(xb - xe) / np.linalg.norm(xe))


def test_banded_auto_gate_uses_stream_cost(monkeypatch):
    """The linsolver auto gate engages the banded F path only when the
    predicted per-application HBM stream beats the element pipeline —
    a wide-band matrix under the storage cap must still fall back (the
    3D-1Z mesh band is 2.9 GB < the 3 GB cap but ~2x slower than the
    element path; the small-n crossover of the cost model is ~2k)."""
    import scipy.sparse as sps

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.solve.sadpnt import SchurSaddleSolver

    monkeypatch.setenv("DNS_TPU_BANDED", "1")
    prob = drivencavity_problem(N=8, nu=1e-2)
    dt = 1e-3
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    # narrow band (2D FEM): stream model predicts a win -> banded on
    s_narrow = SchurSaddleSolver(F, prob.Jc, prob.JTc, ncg=8)
    assert s_narrow.Bblk is not None

    # synthetic wide-band SPD system at n=4096: a random coupling
    # pattern has no narrow RCM ordering, so the full-width band
    # (~200 MB, well under the storage cap) streams slower than the
    # element model predicts for the pipeline -> auto must fall back
    n = 4096
    rng = np.random.default_rng(0)
    R = sps.random(n, n, density=0.01, random_state=rng)
    Fw = sps.csr_matrix(sps.eye(n) * 4.0 + 1e-9 * (R + R.T))
    rj = rng.integers(0, n, size=200)
    cj = np.repeat(np.arange(20), 10)
    Jw = sps.csr_matrix((np.ones(200), (cj, rj)), shape=(20, n))
    s_wide = SchurSaddleSolver(Fw, Jw, Jw.T, ncg=8)
    assert s_wide.Bblk is None
