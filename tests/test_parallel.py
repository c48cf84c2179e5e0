"""Scale-out layer: dof-sharded SpMV and ensemble stepping on the
8-device virtual CPU mesh (SURVEY section 2.10: the reference has no
parallelism at all — these are the TPU-native equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.parallel.domain import ShardedEllMatrix
from dolfin_navier_scipy_tpu.parallel.ensemble import (
    make_ensemble_cnab_step,
)
from dolfin_navier_scipy_tpu.solve import cnab, solve_steadystate_nse


@pytest.fixture(scope="module")
def prob():
    return drivencavity_problem(N=8, nu=1e-2)


def test_sharded_spmv_matches(prob):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("dof",))
    with mesh:
        sA = ShardedEllMatrix(prob.Mc_ell, mesh, axis="dof")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=prob.Mc.shape[1]))
        y = sA.matvec(x)
        assert np.allclose(np.asarray(y), prob.Mc @ np.asarray(x),
                           atol=1e-12)


def test_ensemble_step_matches_serial(prob):
    """The batch-sharded CNAB step equals the single-flow step."""
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("batch",))
    dt = 1e-3
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    with mesh:
        step, place = make_ensemble_cnab_step(prob, dt, mesh)
        B = 16
        rng = np.random.default_rng(5)
        V0 = np.stack([v0 * (1 + 0.01 * k) for k in range(B)])
        V = place(V0)
        NFC = place(np.zeros_like(V0))
        V1, NFC1 = step(V, NFC)
        V1 = np.asarray(V1)
    # serial reference for a couple of ensemble members
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    ops = _build_ops(prob, dt, theta=0.5)
    kern = prob.conv_kernel
    invinds = jnp.asarray(prob.invinds)
    v_bc = jnp.asarray(prob.bc_full_vec())
    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    fp = jnp.asarray(np.asarray(prob.fp).ravel())
    for k in (0, 7, 15):
        v = jnp.asarray(V0[k])
        vf = v_bc.at[invinds].set(v)
        nfc = -kern.vector(vf)[invinds]
        rhs = ops.e_matvec(v) + 0.5 * dt * (3 * nfc - 0.0) + dt * fv
        sol = ops.solver.solve(rhs, fp)
        assert np.allclose(V1[k], np.asarray(sol[:ops.nin]), atol=1e-11)


def test_ensemble_scan_matches_splu_oracle(prob):
    """The batched (vmapped) CNAB scan advances B independent
    trajectories in one lax.scan; every member must match the f64
    splu twin of the same scheme (and members must not couple)."""
    from dolfin_navier_scipy_tpu.ops.convection import (
        convection_vector_host,
    )
    from dolfin_navier_scipy_tpu.parallel.ensemble import (
        make_ensemble_cnab_scan,
    )

    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    dt, nsteps, B = 1e-3, 20, 8
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    V0 = np.stack([v0 * (1 + 0.02 * k) for k in range(B)])

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("batch",))
    run, _ = make_ensemble_cnab_scan(prob, dt, mesh=mesh)
    V = np.asarray(run(V0, nsteps))

    # f64 splu twin (same increment-free CNAB recipe as bench.py's
    # baseline_loop / accuracy oracle)
    nin, npp = len(prob.invinds), prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + 0.5 * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc),
                    sps.csc_matrix((npp, npp))])]).tocsc()
    lu = spsla.splu(K)
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    fv = np.asarray(prob.fv).ravel()
    fp = np.asarray(prob.fp).ravel()
    bcv = prob.bc_full_vec()
    for k in (0, 3, 7):
        v = V0[k].copy()
        full = bcv.copy()
        full[prob.invinds] = v
        nfc_o = -convection_vector_host(prob.ctx, full).ravel()[prob.invinds]
        for _ in range(nsteps):
            full = bcv.copy()
            full[prob.invinds] = v
            nfc_c = -convection_vector_host(
                prob.ctx, full).ravel()[prob.invinds]
            rhs = (M @ v - 0.5 * dt * (A @ v)
                   + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * fv)
            sol = lu.solve(np.concatenate([rhs, fp]))
            v, nfc_o = sol[:nin], nfc_c
        rel = np.linalg.norm(V[k] - v) / np.linalg.norm(v)
        # the batched scan runs the f32 convection kernel (device
        # configuration) on O(dt) increments — same floor as
        # test_full_layout_matches_inner
        assert rel < 1e-6, (k, rel)
    # batch independence: a duplicated member reproduces bit-identically
    V2 = np.asarray(run(np.stack([V0[0]] * B), nsteps))
    assert np.array_equal(V2[0], V2[B - 1])
    assert np.allclose(V2[0], V[0], rtol=1e-12)


def test_ensemble_wspace_scan_matches_dense(prob):
    """The banded w-space ensemble scan (vmapped production fast path:
    RCM-permuted block-Schur solve, conv/A split, warm starts) matches
    the dense-inverse ensemble scan member-for-member at solver
    tolerance, and members stay independent."""
    from dolfin_navier_scipy_tpu.parallel.ensemble import (
        make_ensemble_cnab_scan, make_ensemble_wspace_scan)

    dt, nsteps, B = 1e-3, 12, 8
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    V0 = np.stack([v0 * (1 + 0.02 * k) for k in range(B)])

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("batch",))
    run_w, _ = make_ensemble_wspace_scan(prob, dt, mesh=mesh, refine=1)
    run_d, _ = make_ensemble_cnab_scan(prob, dt, mesh=mesh)
    Vw = np.asarray(run_w(V0, nsteps))
    Vd = np.asarray(run_d(V0, nsteps))
    for k in (0, 3, 7):
        rel = np.linalg.norm(Vw[k] - Vd[k]) / np.linalg.norm(Vd[k])
        assert rel < 1e-6, (k, rel)
    # duplicated members reproduce bit-identically (no cross-coupling)
    V2 = np.asarray(run_w(np.stack([V0[0]] * B), nsteps))
    assert np.array_equal(V2[0], V2[B - 1])


def test_ensemble_wspace_scan_fast_precision(prob):
    """precision='fast' runs the w-space ensemble scan with an f32 work
    dtype on EVERY backend — the TPU configuration, where an untyped
    f64 leak into the scan carry (e.g. the fp/gp component) makes
    lax.scan reject the body with a carry-type mismatch (regression:
    BENCH r03 ensemble sweep failed with exactly that while the
    accurate-mode CPU test passed on its f64 work dtype)."""
    from dolfin_navier_scipy_tpu.parallel.ensemble import (
        make_ensemble_wspace_scan)

    dt, nsteps, B = 1e-3, 6, 3
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    V0 = np.stack([v0 * (1 + 0.02 * k) for k in range(B)])
    run_f, _ = make_ensemble_wspace_scan(prob, dt, refine=1,
                                         precision="fast")
    Vf = np.asarray(run_f(V0, nsteps))
    assert np.isfinite(Vf).all()
    # f32 carry, but still the physical trajectory: compare member 0
    # against the accurate-mode scan at the f32 increment floor
    run_a, _ = make_ensemble_wspace_scan(prob, dt, refine=1)
    Va = np.asarray(run_a(V0, nsteps))
    rel = np.linalg.norm(Vf[0] - Va[0]) / np.linalg.norm(Va[0])
    assert rel < 1e-5, rel


def test_element_sharded_ops_match_serial():
    """Element-axis sharded affine/convection operators (psum reduction,
    no full-vector all-gather) reproduce the serial matvecs exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.ops.convection import ConvectionKernel
    from dolfin_navier_scipy_tpu.parallel.domain import make_mesh
    from dolfin_navier_scipy_tpu.parallel.spatial import (
        ShardedAffineOps, ShardedConvKernel)

    prob = drivencavity_problem(N=8, nu=1e-2)
    mesh = make_mesh(8, axes=("elem",))
    aff = prob.affine_ops()
    saff = ShardedAffineOps(aff, mesh, "elem")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(len(prob.invinds)))
    q = jnp.asarray(rng.standard_normal(prob.np_cond))
    assert np.allclose(saff.ma_matvec(x, 1.0, 0.3),
                       aff.ma_matvec(x, 1.0, 0.3), atol=1e-13)
    assert np.allclose(saff.j_matvec(x), aff.j_matvec(x), atol=1e-13)
    assert np.allclose(saff.jt_matvec(q), aff.jt_matvec(q), atol=1e-13)

    kern = ConvectionKernel(prob.ctx)
    skern = ShardedConvKernel(kern, mesh, "elem")
    vf = jnp.asarray(rng.standard_normal(prob.nv_full))
    assert np.allclose(skern.vector(vf), kern.vector(vf), atol=1e-12)


def test_sharded_cnab_scan_matches_serial(monkeypatch):
    """Multi-step CNAB scan with element-sharded operators on the
    8-device mesh == the serial integrator (VERDICT: a sharded time
    LOOP, not just one sharded matvec)."""
    # the sharded machinery shards the ELEMENT matvec, so its serial
    # twin must use the identical element pipeline (the RCM-banded
    # default is a different algorithm, agreeing only to ~1e-10)
    monkeypatch.setenv("DNS_TPU_BANDED", "0")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.parallel.domain import make_mesh
    from dolfin_navier_scipy_tpu.parallel.spatial import (
        make_sharded_cnab_step)
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse, cnab

    prob = drivencavity_problem(N=8, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    dt = 1e-3
    nsteps = 20
    mesh = make_mesh(8, axes=("elem",))
    step, bundle = make_sharded_cnab_step(prob, dt, mesh)

    @jax.jit
    def run(b, v0, nfc0):
        return jax.lax.scan(lambda c, _: (step(b, c), None),
                            (v0, nfc0), None, length=nsteps)[0]

    # serial reference with the same warm start (nfc at v0)
    kern = prob.conv_kernel
    nfc0 = -kern.vector(jnp.asarray(prob.embed(v0)))[
        jnp.asarray(prob.invinds)]
    v_sh, _ = run(bundle, jnp.asarray(v0), nfc0)

    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    ops = _build_ops(prob, dt, theta=0.5, linsolver="schur")
    vb = jnp.asarray(prob.bc_full_vec())
    inv = jnp.asarray(prob.invinds)
    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    zp = jnp.zeros((prob.np_cond,))

    def sstep(c, _):
        v, nfc_o = c
        nfc_c = -kern.vector(vb.at[inv].set(v))[inv]
        rhs_d = -dt * ops.A.matvec(v) + 0.5 * dt * (3 * nfc_c - nfc_o) \
            + dt * fv
        sol = ops.solver.solve(rhs_d, zp)
        return (v + sol[:ops.nin], nfc_c), None

    (v_ser, _), _ = jax.lax.scan(sstep, (jnp.asarray(v0), nfc0),
                                 None, length=nsteps)
    rel = (np.linalg.norm(np.asarray(v_sh) - np.asarray(v_ser))
           / np.linalg.norm(np.asarray(v_ser)))
    assert rel < 1e-11, rel


def test_sharded_schur_factors_match_replicated():
    """Row-sharding the dense Schur factors (X, stacked S^-1) over the
    8-device mesh reproduces the replicated-factor scan exactly — the
    capacity mode (VERDICT r2 #1: multi-chip must extend memory past the
    single-chip ceiling, not just add throughput)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dolfin_navier_scipy_tpu.models import drivencavity_problem
    from dolfin_navier_scipy_tpu.parallel.domain import make_mesh
    from dolfin_navier_scipy_tpu.parallel.spatial import (
        ShardedSchurSolver, make_sharded_cnab_step)
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    prob = drivencavity_problem(N=8, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    dt = 1e-3
    nsteps = 20
    mesh = make_mesh(8, axes=("elem",))
    step_r, bun_r = make_sharded_cnab_step(prob, dt, mesh)
    step_s, bun_s = make_sharded_cnab_step(prob, dt, mesh,
                                           shard_factors=True)
    assert isinstance(bun_s["solver"], ShardedSchurSolver)
    # the sharded solver holds 1/ndev of each dense factor per device
    # (X^T is split along its big velocity-column axis)
    xsh = bun_s["solver"].XT_sh
    assert len(xsh.sharding.device_set) == 8
    shard_cols = {s.data.shape[1] for s in xsh.addressable_shards}
    assert shard_cols == {xsh.shape[1] // 8}

    kern = prob.conv_kernel
    nfc0 = -kern.vector(jnp.asarray(prob.embed(v0)))[
        jnp.asarray(prob.invinds)]

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def run(step, b, v0, nfc0):
        return jax.lax.scan(lambda c, _: (step(b, c), None),
                            (v0, nfc0), None, length=nsteps)[0]

    v_rep, _ = run(step_r, bun_r, jnp.asarray(v0), nfc0)
    v_shd, _ = run(step_s, bun_s, jnp.asarray(v0), nfc0)
    rel = (np.linalg.norm(np.asarray(v_shd) - np.asarray(v_rep))
           / np.linalg.norm(np.asarray(v_rep)))
    assert rel < 1e-12, rel


@pytest.fixture(scope="module")
def prob_halo():
    # the 1D band decomposition needs n/bandwidth >= ndev: the N=8
    # cavity (450 dofs, RCM bandwidth 107) cannot split 8 ways; N=16
    # (1922 dofs, bandwidth 131) can
    return drivencavity_problem(N=16, nu=1e-2)


def test_halo_matvecs_match_serial(prob_halo):
    """Halo-exchange operators (O(bandwidth) ppermutes, no O(n)
    collective) reproduce the serial affine matvecs to f64 accuracy."""
    from dolfin_navier_scipy_tpu.parallel.halo import HaloAffineOps

    prob = prob_halo
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("elem",))
    aff = prob.affine_ops(jnp.float64)
    halo = HaloAffineOps(aff, mesh)
    rng = np.random.default_rng(11)
    nin, npc = len(prob.invinds), prob.np_cond
    x = jnp.asarray(rng.normal(size=nin))
    q = jnp.asarray(rng.normal(size=npc))
    with mesh:
        xp = halo.to_perm(x)
        qp = halo.to_perm(q, pressure=True)
        for kind, ref in [
            ("m", aff.m_matvec(x)),
            ("ma", aff.ma_matvec(x, 0.7, 1.3)),
        ]:
            got = halo.from_perm(
                halo.ma_matvec(xp, 0.7, 1.3) if kind == "ma"
                else halo.m_matvec(xp))
            assert np.allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-11), kind
        gj = halo.from_perm(halo.j_matvec(xp), pressure=True)
        assert np.allclose(np.asarray(gj), np.asarray(aff.j_matvec(x)),
                           atol=1e-11)
        gjt = halo.from_perm(halo.jt_matvec(qp))
        assert np.allclose(np.asarray(gjt), np.asarray(aff.jt_matvec(q)),
                           atol=1e-11)


def test_halo_pcg_solves(prob_halo):
    """The fused halo PCG (scalar psums + halo ppermutes only) solves
    the mass-dominated F system to the serial-PCG solution."""
    import scipy.sparse as sps

    from dolfin_navier_scipy_tpu.parallel.halo import HaloAffineOps
    from dolfin_navier_scipy_tpu.solve.sadpnt import jacobi_pcg

    prob = prob_halo
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("elem",))
    aff = prob.affine_ops(jnp.float64)
    halo = HaloAffineOps(aff, mesh)
    dt = 1e-2
    cm, ca = 1.0, 0.5 * dt
    F = sps.csr_matrix(prob.Mc + ca * prob.Ac)
    dinv = 1.0 / np.asarray(F.diagonal())
    rng = np.random.default_rng(7)
    b = rng.normal(size=F.shape[0])
    x_ser = np.asarray(jacobi_pcg(
        lambda v: aff.ma_matvec(v, cm, ca), jnp.asarray(dinv),
        jnp.asarray(b), 40))
    with mesh:
        bp = halo.to_perm(jnp.asarray(b))
        dp = halo.to_perm(jnp.asarray(dinv))
        xp = halo.pcg_solve(bp, dp, cm, ca, 40)
        x_halo = np.asarray(halo.from_perm(xp))
    assert np.allclose(x_halo, x_ser, atol=1e-10)


def test_halo_cnab_full_step(prob_halo):
    """The END-TO-END halo CNAB scan (state sharded across the time
    loop; convection + A-matvec + nested matrix-free Schur solve all
    device-local with O(bandwidth) exchanges) matches (a) a serial twin
    of the identical algorithm to f64 roundoff and (b) the f64 splu
    CNAB oracle at nested-solver accuracy."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    from dolfin_navier_scipy_tpu.parallel.halo import (
        halo_cnab_scan, make_halo_cnab_step,
    )
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    prob = prob_halo
    dt, theta = 2e-3, 0.5
    nsteps, nf, ns, nlp = 12, 30, 10, 25
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("elem",))
    with mesh:
        halo, hconv, bundle = make_halo_cnab_step(prob, dt, mesh,
                                                  theta=theta)
        v0p = halo.to_perm(jnp.asarray(v0))
        vT = halo.from_perm(halo_cnab_scan(
            halo, hconv, bundle, v0p, nsteps, dt, theta=theta,
            niter_f=nf, niter_s=ns, niter_lp=nlp))
    v_halo = np.asarray(vT)

    # (a) serial twin: the SAME algorithm (mf_solvers/mf_schur_cnab_ops)
    # over the unsharded operators
    from jax import lax

    from dolfin_navier_scipy_tpu.parallel.halo import (
        mf_schur_cnab_ops, mf_solvers,
    )

    aff = prob.affine_ops(jnp.float64)
    kern = prob.conv_kernel
    invinds = jnp.asarray(prob.invinds)
    v_bc = jnp.asarray(prob.bc_full_vec())
    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    fp = jnp.asarray(np.asarray(prob.fp).ravel())
    F = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
    dinvF = jnp.asarray(1.0 / np.asarray(F.diagonal()).ravel())
    Jm = sps.csr_matrix(prob.Jc)
    dS = np.asarray(Jm.multiply(Jm)
                    @ (1.0 / np.asarray(F.diagonal()).ravel())).ravel()
    dinvS = jnp.asarray(np.where(dS > 0, 1.0 / np.where(dS > 0, dS, 1.0),
                                 0.0))
    dMp = np.asarray(prob.MP.diagonal()).ravel()[: prob.np_cond]
    dinvMp = jnp.asarray(theta * dt * float(prob.nu) / dMp)
    cm, ca = 1.0, theta * dt

    def fmv(x):
        return aff.ma_matvec(x, cm, ca)

    def conv(v):
        return kern.vector(v_bc.at[invinds].set(v))[invinds]

    pcg, fcg_s = mf_solvers(jnp.dot, fmv, aff.j_matvec, aff.jt_matvec,
                            dinvF, dinvS, dinvMp, nf, ns, nlp)
    step = mf_schur_cnab_ops(
        dict(fmv=fmv, amv=aff.a_matvec, jmv=aff.j_matvec,
             jtmv=aff.jt_matvec, conv=conv, pcg=pcg, fcg_s=fcg_s),
        dict(dt=dt, theta=theta, fv=fv, fp=fp, dinvF=dinvF, niter_f=nf))
    c0 = (jnp.asarray(v0), -conv(jnp.asarray(v0)),
          jnp.zeros(len(prob.invinds)), jnp.zeros(prob.np_cond),
          jnp.zeros(len(prob.invinds)))
    (v, _, _, _, _), _ = lax.scan(step, c0, None, length=nsteps)
    v_ser = np.asarray(v)

    rel_twin = (np.linalg.norm(v_halo - v_ser)
                / np.linalg.norm(v_ser))
    assert rel_twin < 1e-10, rel_twin

    # (b) splu oracle of the same CNAB recipe
    nin, npp = len(prob.invinds), prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + theta * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc),
                    sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    fvn = np.asarray(prob.fv).ravel()
    fpn = np.asarray(prob.fp).ravel()
    bcv = prob.bc_full_vec()
    vo = v0.copy()
    fullv = bcv.copy()
    fullv[prob.invinds] = vo
    nfo = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
    for _ in range(nsteps):
        fullv = bcv.copy()
        fullv[prob.invinds] = vo
        nfc = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
        rhs = (M @ vo - 0.5 * dt * (A @ vo)
               + 0.5 * dt * (3 * nfc - nfo) + dt * fvn)
        sol = lu.solve(np.concatenate([rhs, fpn]))
        vo, nfo = sol[:nin], nfc
    rel_oracle = np.linalg.norm(v_halo - vo) / np.linalg.norm(vo)
    assert rel_oracle < 1e-6, rel_oracle


def test_halo_banded_conv_matches_element(prob_halo):
    """The per-shard banded convection tail (static-window S/G matmuls,
    unified window bases across devices — parallel/halo.py
    _build_banded_tail) reproduces the element-pipeline halo scan to
    f64 roundoff, and the banded build actually engaged."""
    from dolfin_navier_scipy_tpu.parallel.halo import (
        halo_cnab_scan, make_halo_cnab_step,
    )
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    prob = prob_halo
    dt, theta = 2e-3, 0.5
    nsteps = 12
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("elem",))
    out = {}
    with mesh:
        for key, banded in (("banded", True), ("element", False)):
            halo, hconv, bundle = make_halo_cnab_step(
                prob, dt, mesh, theta=theta, banded_conv=banded)
            assert (hconv.b_leaves is not None) == banded
            v0p = halo.to_perm(jnp.asarray(v0))
            vT = halo.from_perm(halo_cnab_scan(
                halo, hconv, bundle, v0p, nsteps, dt, theta=theta,
                niter_f=30, niter_s=10, niter_lp=25))
            out[key] = np.asarray(vT)
    rel = (np.linalg.norm(out["banded"] - out["element"])
           / np.linalg.norm(out["element"]))
    assert rel < 1e-10, rel


def test_halo_cnab_cylinder_wake_with_control_arcs():
    """Halo CNAB on the CYLINDER WAKE with Robin control arcs (VERDICT
    r3 weak #5: the halo path was validated only on driven-cavity
    toys).  Multi-region BCs (inflow parabola / walls / outflow / Robin
    control arcs on the cylinder) exercise the bc-tail handling and the
    facet-corrected A matvec inside the sharded step; the scan must
    land on the f64 splu CNAB oracle at nested-solver accuracy."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.parallel.halo import (
        halo_cnab_scan, make_halo_cnab_step,
    )
    from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2,
                                bccontrol=True)
    dt, theta = 1e-3, 0.5
    nsteps, nf, ns, nlp = 10, 30, 10, 25
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("elem",))
    with mesh:
        halo, hconv, bundle = make_halo_cnab_step(prob, dt, mesh,
                                                  theta=theta)
        v0p = halo.to_perm(jnp.asarray(v0))
        vT = halo.from_perm(halo_cnab_scan(
            halo, hconv, bundle, v0p, nsteps, dt, theta=theta,
            niter_f=nf, niter_s=ns, niter_lp=nlp))
    v_halo = np.asarray(vT)

    # f64 splu oracle of the same CNAB recipe
    kern = prob.conv_kernel
    nin, npp = len(prob.invinds), prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + theta * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc),
                    sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    fvn = np.asarray(prob.fv).ravel()
    fpn = np.asarray(prob.fp).ravel()
    bcv = prob.bc_full_vec()
    vo = v0.copy()
    fullv = bcv.copy()
    fullv[prob.invinds] = vo
    nfo = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
    for _ in range(nsteps):
        fullv = bcv.copy()
        fullv[prob.invinds] = vo
        nfc = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
        rhs = (M @ vo - 0.5 * dt * (A @ vo)
               + 0.5 * dt * (3 * nfc - nfo) + dt * fvn)
        sol = lu.solve(np.concatenate([rhs, fpn]))
        vo, nfo = sol[:nin], nfc
    rel = np.linalg.norm(v_halo - vo) / np.linalg.norm(vo)
    assert rel < 1e-6, rel
