"""Headline benchmark: CNAB time-integration throughput on the DFG
cylinder wake (the reference's 2D-2 configuration: Re=100, charvel=1).

Prints ONE JSON line:
    {"metric": ..., "value": steps/s (device), "unit": "steps/s",
     "vs_baseline": speedup over the reference-style scipy-splu loop}

The baseline twin reproduces the reference's per-step recipe
(time_int_utils.py:104-143): one scipy ``splu`` factorization reused for
all steps + per-step convection re-assembly (host, vectorized numpy —
*faster* than the reference's FEniCS round trip, so the reported
speedup is conservative).

The device loop is the INCREMENT-form CNAB step (solve/timeint.py) in
the full-dof state layout: all per-step arithmetic is f32 on the MXU;
because the saddle solve targets the O(dt)-sized increment, the
f64-carried trajectory matches the f64 splu trajectory to ~5e-8 over
300 steps (measured) — there is no separate slow "f64 mode" anymore.
``accurate`` (f64 carry) and ``fast`` (f32 carry) share the kernels.
Measured on v5e (exclusive machine): ~750 steps/s accurate = ~12x the
splu baseline at 8k dofs (fused convection+stiffness element pipeline,
full-dof layout) in a GOOD tunnel window.  CAVEAT (docs/PERF_NOTES.md
section 5): the tunneled TPU's absolute throughput varies by MULTIPLES
across sessions/time-windows (measured 245-731 steps/s for the same
lvl1 configuration); ``session_app_us_lvl1`` in the JSON records the
per-application in-scan cost of the same session so numbers can be
normalized — a step is ~(n_applications x that).  Levels 2/3 run the
block-Schur path with ``warm_refine=1`` (one residual round per step):
the reported steps/s and the <=1e-6 ``rel_err`` come from the SAME
configuration; the ``_fast`` twin (no refine; floor = the active
solver tolerance — PCG ~2e-4 / W-truncation wtol) is ~2x.
"""

import json
import os
import time

import numpy as np

# Older toolchains registered the tunneled-TPU plugin as platform
# "axon"; current ones register it as plain "tpu".  A stale
# JAX_PLATFORMS=axon pin then hard-fails backend init ("'axon' is not
# in the list of known backends").  Clearing the pin is safe in both
# worlds: auto-selection prefers any accelerator plugin over cpu.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
    os.environ["JAX_PLATFORMS"] = ""


def _arm_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _first_dispatch_watchdog(timeout_s=120):
    """The tunneled runtime occasionally hangs a process's FIRST device
    dispatch indefinitely (no CPU, no error; the same code in a fresh
    process runs immediately — observed repeatedly on 2026-08-19).
    Run a tiny dispatch in a thread; if it does not complete in
    ``timeout_s`` the process is wedged — return False so the caller
    can bail out fast instead of burning its full subprocess timeout."""
    import threading

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return True
    done = threading.Event()

    def ping():
        x = jnp.ones((128, 128), jnp.float32)
        (x @ x).block_until_ready()
        done.set()

    threading.Thread(target=ping, daemon=True).start()
    return done.wait(timeout_s)


def _canary_gbps():
    """Detect the tunneled runtime's per-process SLOW MODE: some
    processes land in a persistent state where the banded-einsum op
    class runs ~60x slower than its HBM floor (measured 9-28 ms vs
    0.2 ms for the same 160 MB application, same day, adjacent
    processes; docs/PERF_NOTES.md section 9).  Times that op class in a
    short scan and returns its effective GB/s (-1.0 when the result
    cache serves phantoms — also untrustworthy)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from jax import lax

    rng = np.random.default_rng(7)
    nblk, bs = 40, 512
    B = jnp.asarray(rng.standard_normal((nblk, bs, 3 * bs)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(nblk * bs), jnp.float32)

    @partial(jax.jit, static_argnums=2)
    def run(B, x, k):
        def body(c, _):
            xw = c.reshape(nblk, bs)
            zero = jnp.zeros((1, bs), c.dtype)
            win = jnp.concatenate(
                [jnp.concatenate([zero, xw[:-1]], 0), xw,
                 jnp.concatenate([xw[1:], zero], 0)], 1)
            y = jnp.einsum("kij,kj->ki", B, win).reshape(-1)
            return y / (jnp.linalg.norm(y) + 1e-9), None

        return lax.scan(body, x, None, length=k)[0]

    # scans long enough that the ~0.5 ms per-dispatch tunnel overhead
    # vanishes from the slope (short scans underestimate GB/s by 10x)
    run(B, x0, 20).block_until_ready()
    run(B, x0, 120).block_until_ready()
    ts, vals = {}, []
    for k in (20, 120):
        els = []
        for j in (1, 2):
            xp = x0 * (1 + j * 1e-6)
            t0 = time.perf_counter()
            o = run(B, xp, k)
            o.block_until_ready()
            els.append(time.perf_counter() - t0)
            vals.append(np.asarray(o))
        ts[k] = min(els)
    if np.array_equal(vals[-1], vals[-2]):
        return -1.0
    per = (ts[120] - ts[20]) / 100
    return float(B.size * 4 / per / 1e9)


# Calibrated 2026-08-19 with this (120-step-slope) canary: healthy
# processes measured 82-270 GB/s (the low end under concurrent load),
# slow-mode processes 5-20 GB/s.  50 splits the two populations with
# margin on both sides; misclassifying healthy-as-slow only costs a
# bounded re-exec.
_SLOW_MODE_GBPS = 50.0


def _ensure_fast_process():
    """Re-exec the bench (bounded) when this process drew the slow
    mode — steps/s from a slow-mode process are meaningless.  Returns
    the measured canary GB/s for the output JSON."""
    import jax

    def _reexec():
        tries = int(os.environ.get("DNS_TPU_BENCH_RETRY", "0"))
        if tries < 2:
            import sys

            env = dict(os.environ, DNS_TPU_BENCH_RETRY=str(tries + 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)

    if not _first_dispatch_watchdog():
        _reexec()          # wedged first dispatch: a fresh process fixes it
        # out of retries: every re-exec drew a wedged first dispatch —
        # the tunnel itself is down, not the per-process lottery.  The
        # caller must avoid in-process device work (it would hang
        # forever) and fall back to subprocess-isolated measurements,
        # which bail out via their own watchdogs.
        return -2.0
    g = _canary_gbps()
    if jax.default_backend() == "cpu" or g >= _SLOW_MODE_GBPS:
        return g
    _reexec()
    return g   # out of retries: report with the (bad) canary attached


def build(level=1):
    from dolfin_navier_scipy_tpu.models import cylinderwake_problem

    prob = cylinderwake_problem(level=level, nu=1e-3, charvel=1.0)  # Re=100
    # CNAB's explicit AB2 convection has a CFL-type stability bound that
    # tightens with mesh refinement (the reference's own stability lore:
    # tests/start-generic-tdp-sim.sh "4200 was OK with CNAB, 4000 not").
    # Measured with the f64 splu ORACLE from the Stokes start (300
    # steps): lvl3 blows up at dt=2.5e-4 and 1.25e-4, stable at
    # 6.25e-5 — the benchmark must run a stable configuration
    # (baseline and device use the same dt, so vs_baseline is fair).
    dt = 2.5e-4 if level < 3 else 6.25e-5
    return prob, dt


def device_steps_per_sec(prob, dt, nsteps=1500, mode="accurate",
                         linsolver="auto", layout="inner", v0=None,
                         ops=None, warm_refine=0, niter_warm=None):
    """One increment-form CNAB step per scan iteration, in the full-dof
    state layout (dense path) or the inner layout (Schur path).

    ``accurate``: f64 carry (the default trajectory mode);
    ``fast``: f32 carry.  Both run the same f32 device kernels.
    Returns ``(steps_per_sec, final_v_inner, ops)``.

    NOTE: the warmup runs the SAME scan length as the timed call (the
    length is a static arg — a different warmup length would leave the
    compile inside the timing), and the timed call perturbs the input
    (the axon runtime caches results for identical inputs).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops, _kern

    precision = "fast" if mode == "fast" else "accurate"
    if ops is None:
        ops = _build_ops(prob, dt, theta=0.5, precision=precision,
                         linsolver=linsolver, layout=layout)
    kern = _kern(prob, "fast")          # f32 convection kernel
    nin = len(prob.invinds)
    cdtype = jnp.float32 if mode == "fast" else jnp.float64
    wd = ops.wdtype
    from functools import partial

    import scipy.sparse as _sps

    v0 = (np.zeros(nin) if v0 is None else np.asarray(v0, np.float64))
    gp0 = jnp.asarray(_sps.csr_matrix(prob.Jc) @ v0)

    schur_full = hasattr(ops, "full_schur")
    if hasattr(ops.solver, "Kinv") or schur_full:
        from dolfin_navier_scipy_tpu.solve.timeint import (
            build_full_layout,
        )

        split = (schur_full
                 and getattr(ops.solver, "Eblk", None) is not None)
        if schur_full:
            fvf = np.zeros(prob.nv_full)
            if split:
                # conv/A split (solve/timeint.py): banded diffusion on
                # inner rows; the constant A_ib bc coupling cancels the
                # fvbc fold
                fvf[prob.invinds] = np.asarray(prob.fv).ravel()
            else:
                fvbc = -np.asarray(
                    prob.full["A"]
                    @ prob.bc_full_vec()).ravel()[prob.invinds]
                fvf[prob.invinds] = np.asarray(prob.fv).ravel() - fvbc
            fl = dict(aff=ops.full_schur, Zp=None,
                      fv=jnp.asarray(fvf, jnp.float32),
                      nf=prob.nv_full, npp=prob.np_cond)
        else:
            fl = build_full_layout(prob, dt, ops)
        nf, npp = fl["nf"], fl["npp"]
        # PERMUTED state layout (mirrors solve/timeint.py use_w): the
        # banded solver's rhs is a slice of the step rhs; element
        # tables re-indexed once; no per-solve gather/scatter
        use_w = (schur_full
                 and getattr(ops.solver, "Bblk", None) is not None)
        fp_nat = jnp.asarray(np.asarray(prob.fp).ravel())
        fv_use = fl["fv"]
        facv = fl["aff"].fac_vdofs
        vf0 = prob.bc_full_vec()
        vf0[prob.invinds] = v0
        if use_w:
            slv = ops.solver
            wsrc = np.concatenate([
                np.asarray(slv.permf),
                np.setdiff1d(np.arange(prob.nv_full),
                             np.asarray(prob.invinds))]).astype(np.int64)
            iposx = np.full(prob.nv_full + 1, prob.nv_full, np.int32)
            iposx[wsrc] = np.arange(prob.nv_full, dtype=np.int32)
            kern = kern.with_dof_map(jnp.asarray(iposx))
            if facv is not None:
                facv = jnp.asarray(iposx)[
                    jnp.minimum(facv, prob.nv_full)]
            fv_use = fl["fv"][jnp.asarray(wsrc)]
            fp_nat = fp_nat[jnp.asarray(np.asarray(slv.pidx))]
            gp0 = gp0[jnp.asarray(np.asarray(slv.pidx))]
            vf0 = vf0[wsrc]
        bundle = dict(aff=fl["aff"], Zp=fl["Zp"], slv=ops.solver,
                      fv=fv_use, kern=kern, facv=facv,
                      fp=fp_nat)
        state0 = jnp.asarray(vf0, cdtype)

        nu = float(prob.nu)
        sym = bool(getattr(prob, "gradvsymmtrc", True))

        nin_p = getattr(ops.solver, "_nin", 0) if schur_full else 0

        # banded convection tail (solve/timeint.py twin): replaces the
        # element pipeline's gather/segment_sum with static-window
        # banded matmuls when its predicted HBM stream wins
        bct = None
        if use_w and split:
            from dolfin_navier_scipy_tpu.ops.banded_conv import (
                build_banded_conv_tail,
            )

            bct = build_banded_conv_tail(kern, nin_p,
                                         np.asarray(vf0[nin_p:]))
        use_bct = bct is not None
        if use_bct:
            bundle["bct"] = bct

        def step(b, carry, _):
            vf, nfc_o, gp = carry[0], carry[1], carry[2]
            if split:
                # conv/A split: convection-only element pipeline +
                # banded diffusion matvec (solve/timeint.py twin)
                cv = (b["bct"].vector(vf) if use_bct
                      else b["kern"].vector(vf))
                nfc_c = (-cv).astype(jnp.float32)
                av_i = b["slv"].band_extra_mv(vf[:nin_p])
                rhs = (jnp.float32(0.5 * dt) * (3.0 * nfc_c - nfc_o)
                       + jnp.float32(dt) * b["fv"])
                rhs = rhs.at[:nin_p].add(
                    jnp.float32(-dt) * av_i.astype(jnp.float32))
            else:
                # fused element pipeline: convection + stiffness share
                # the gather and one stacked scatter
                cv, av = b["kern"].vector_and_amatvec(
                    vf, nu, sym=sym,
                    fac_elem=b["aff"].fac_elem, fac_vdofs=b["facv"])
                nfc_c = (-cv).astype(jnp.float32)
                rhs = (jnp.float32(-dt) * av.astype(jnp.float32)
                       + jnp.float32(0.5 * dt) * (3.0 * nfc_c - nfc_o)
                       + jnp.float32(dt) * b["fv"])
            rp = (b["fp"] - gp).astype(jnp.float32)
            if schur_full:
                from dolfin_navier_scipy_tpu.solve.timeint import (
                    _NITER_WARM,
                )

                ysol, ysol_p = carry[3], carry[4]
                if use_w:
                    dvp, _, y_n = b["slv"].solve_warm_wspace(
                        rhs, rp, 2.0 * ysol - ysol_p,
                        niter=(niter_warm or _NITER_WARM),
                        refine=warm_refine)
                    dv = jnp.concatenate(
                        [dvp, jnp.zeros((nf - dvp.shape[0],),
                                        dvp.dtype)])
                    return (vf + dv.astype(vf.dtype), nfc_c, b["fp"],
                            y_n, ysol), None
                sol, y_n = b["slv"].solve_warm(rhs, rp,
                                               2.0 * ysol - ysol_p,
                                               niter=(niter_warm
                                                      or _NITER_WARM),
                                               refine=warm_refine)
                return (vf + sol[:nf].astype(vf.dtype), nfc_c, b["fp"],
                        y_n, ysol), None
            sol = b["Zp"] @ jnp.concatenate([rhs, rp])
            return (vf + sol[:nf].astype(vf.dtype), nfc_c, b["fp"]), None

        @partial(jax.jit, static_argnums=3)
        def run(b, s0, gp0, n):
            nfc0 = (-b["kern"].vector(s0)).astype(jnp.float32)
            c0 = (s0, nfc0, gp0)
            if schur_full:
                # banded solvers carry the warm start in PERMUTED inner
                # space (solver.warm_size); opaque to this loop
                ysz = getattr(ops.solver, "warm_size", nf)
                c0 = c0 + (jnp.zeros((ysz,), wd), jnp.zeros((ysz,), wd))
            out, _ = lax.scan(lambda c, x: step(b, c, x),
                              c0, None, length=n)
            return out[0]

        # phantom/order-effect hardening: 3 timed runs with DISTINCT
        # perturbations; outputs must differ pairwise (defeats the axon
        # result cache) and the MEDIAN timing is reported (successive
        # runs in one process have shown 2-4x order-dependent drift —
        # docs/PERF_NOTES.md section 5)
        run(bundle, state0, gp0, nsteps).block_until_ready()
        els, vals = [], []
        for k in (1, 2, 3):
            t0 = time.perf_counter()
            vf = run(bundle, state0 + jnp.asarray(k * 1e-13, cdtype),
                     gp0, nsteps)
            vf.block_until_ready()
            els.append(time.perf_counter() - t0)
            vals.append(np.asarray(vf))
        assert not np.array_equal(vals[0], vals[1]), "axon result cache!"
        el = float(np.median(els))
        v = (vals[-1][iposx[np.asarray(prob.invinds)]] if use_w
             else vals[-1][prob.invinds])
        assert np.isfinite(v).all()
        return nsteps / el, v, ops

    bundle = dict(
        ops=ops, kern=kern,
        invinds=jnp.asarray(prob.invinds),
        v_bc=jnp.asarray(prob.bc_full_vec()),
        fv=jnp.asarray(np.asarray(prob.fv).ravel()),
        fp=jnp.asarray(np.asarray(prob.fp).ravel()),
    )

    def step(b, carry, _):
        # increment-form CNAB; the carried gp enforces J v = fp by
        # div-free induction (the O(dt) difference fp - gp is exact;
        # nonzero only on the first step when v0 is not div-consistent).
        v, nfc_o, gp = carry
        v_full = b["v_bc"].at[b["invinds"]].set(v)
        nfc_c = (-b["kern"].vector(v_full)[b["invinds"]]).astype(wd)
        rhs_d = (jnp.asarray(-dt, wd) * b["ops"].A.matvec(v).astype(wd)
                 + jnp.asarray(0.5 * dt, wd) * (3.0 * nfc_c - nfc_o)
                 + jnp.asarray(dt, wd) * b["fv"].astype(wd))
        sol = b["ops"].solver.solve(rhs_d, (b["fp"] - gp).astype(wd))
        return (v + sol[:nin].astype(v.dtype), nfc_c, b["fp"]), None

    @partial(jax.jit, static_argnums=3)
    def run(b, v0, gp0, n):
        # warm the AB2 "previous" convection at v0 (the reference's cnab
        # hands nfc_c from the bootstrap into the loop)
        v_full0 = b["v_bc"].at[b["invinds"]].set(v0)
        nfc0 = (-b["kern"].vector(v_full0)[b["invinds"]]).astype(wd)
        (v, nfc, _), _ = lax.scan(lambda c, x: step(b, c, x),
                                  (v0, nfc0, gp0), None, length=n)
        return v

    v0j = jnp.asarray(v0, cdtype)
    run(bundle, v0j, gp0, nsteps).block_until_ready()
    els, vals = [], []
    for k in (1, 2, 3):
        t0 = time.perf_counter()
        v = run(bundle, v0j + jnp.asarray(k * 1e-13, cdtype), gp0, nsteps)
        v.block_until_ready()
        els.append(time.perf_counter() - t0)
        vals.append(np.asarray(v))
    assert not np.array_equal(vals[0], vals[1]), "axon result cache!"
    el = float(np.median(els))
    assert np.isfinite(vals[-1]).all()
    return nsteps / el, vals[-1], ops


def ensemble_traj_steps_per_sec(prob, dt, v0, B=16, nsteps=300,
                                scan="wspace"):
    """Aggregate trajectory-steps/s of the vmapped-batch CNAB scan.

    B independent trajectories ride one lax.scan, so every per-member
    operator application becomes ONE batched MXU matmul that reads the
    shared tables from HBM once for all B members (the
    single-trajectory step is HBM/latency-bound, docs/PERF_NOTES.md) —
    the TPU-native form of the reference's serial parameter-sweep
    workflow (tests/start-generic-tdp-sim.sh: one process per
    parameter).  ``scan='wspace'`` batches the PRODUCTION banded
    w-space step (refine=1, accuracy parity with the serial headline);
    ``'dense'`` keeps the dense-inverse scan for comparison.
    Same phantom hardening as device_steps_per_sec: perturbed inputs,
    outputs-must-differ, median of 3.
    """
    from dolfin_navier_scipy_tpu.parallel.ensemble import (
        make_ensemble_cnab_scan, make_ensemble_wspace_scan,
    )

    if scan == "wspace":
        run, _ = make_ensemble_wspace_scan(prob, dt, refine=1)
    else:
        run, _ = make_ensemble_cnab_scan(prob, dt)
    rng = np.random.default_rng(11)
    V0 = np.stack([v0 * (1 + 1e-4 * rng.standard_normal(len(v0)))
                   for _ in range(B)])
    import jax

    jax.block_until_ready(run(V0, nsteps))      # compile + warm
    els, vals = [], []
    for k in (1, 2, 3):
        t0 = time.perf_counter()
        V = run(V0 * (1 + k * 1e-13), nsteps)
        jax.block_until_ready(V)
        els.append(time.perf_counter() - t0)
        vals.append(np.asarray(V))
    assert not np.array_equal(vals[0], vals[1]), "axon result cache!"
    assert np.isfinite(vals[-1]).all()
    el = float(np.median(els))
    return B * nsteps / el


def measure_app_us(prob, dt, nsteps=300):
    """Session-quality probe: the in-scan cost of ONE F-application
    (element-pipeline matvec), measured as the step-time slope between
    6 and 14 warm PCG iterations of the PRODUCTION Schur scan (the same
    measurement path as every steps/s number here, with its perturbed
    inputs + outputs-must-differ result-cache guard; standalone chained-
    matvec probes were observed to get served stale results by the axon
    runtime regardless of fresh inputs).  The per-step cost of every
    solver is ~(n_applications x this number) — the tunneled TPU's
    windows differ by multiples across sessions (docs/PERF_NOTES.md
    section 5), so BENCH JSONs carry this to normalize steps/s."""
    import numpy as np

    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                     linsolver="schur", layout="full")
    v0 = np.zeros(len(prob.invinds))
    sps = {}
    for it in (6, 14):
        sps[it], _, ops = device_steps_per_sec(
            prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
            layout="full", v0=v0, ops=ops, niter_warm=it)
    return 1e6 * (1.0 / sps[14] - 1.0 / sps[6]) / 8


def baseline_loop(prob, dt, nsteps=60, v0=None, return_v=False):
    """Reference-style loop: scipy splu (f64) + host convection assembly.
    Doubles as the f64 accuracy oracle."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    from dolfin_navier_scipy_tpu.ops.convection import (
        convection_vector_host,
    )

    nin = len(prob.invinds)
    npp = prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + 0.5 * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc), sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    fv = np.asarray(prob.fv).ravel()
    fp = np.asarray(prob.fp).ravel()
    bcv = prob.bc_full_vec()
    inv = prob.invinds

    v = np.zeros(nin) if v0 is None else np.asarray(v0, np.float64).copy()
    full = bcv.copy()
    full[inv] = v
    nfc_o = -convection_vector_host(prob.ctx, full).ravel()[inv]

    t0 = time.perf_counter()
    for _ in range(nsteps):
        full = bcv.copy()
        full[inv] = v
        nfc_c = -convection_vector_host(prob.ctx, full).ravel()[inv]
        rhs = (M @ v - 0.5 * dt * (A @ v)
               + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * fv)
        sol = lu.solve(np.concatenate([rhs, fp]))
        v, nfc_o = sol[:nin], nfc_c
    el = time.perf_counter() - t0
    assert np.isfinite(v).all()
    if return_v:
        return nsteps / el, v
    return nsteps / el


def _level_body(level, nsteps=300, base_steps=20, oracle_steps=300,
                warm_refine=1):
    """Level-N measurement: steps/s + splu-twin baseline + trajectory
    rel_err vs the f64 splu oracle over ``oracle_steps`` from the Stokes
    state (run inside the subprocess, see :func:`level_steps_per_sec`).

    ``warm_refine=1``: one short residual-correction round per step —
    the f32 Schur path's trajectory-error floor is the in-step solve
    tolerance (docs/PERF_NOTES.md), and the refinement buys the <=1e-6
    regime at ~2x the step cost; the reported steps/s is measured in
    the SAME configuration that delivers the reported rel_err."""
    import numpy as np

    _arm_cache()
    import jax

    if not _first_dispatch_watchdog():
        # wedged first dispatch (see the watchdog docstring): bail fast
        # so the parent retries in a fresh process instead of burning
        # the full subprocess timeout
        return {"slow_mode": True, "hang": True}
    g = _canary_gbps()
    if jax.default_backend() != "cpu" and g < _SLOW_MODE_GBPS:
        # this subprocess drew the runtime's slow mode — tell the
        # parent to retry in a fresh process (timings here would be
        # ~60x off, docs/PERF_NOTES.md section 9)
        return {"slow_mode": True, "canary_gbps": round(g, 1)}
    t0 = time.time()
    prob, dt = build(level=level)
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[: len(prob.invinds), 0]
    sps_, v_dev, ops = device_steps_per_sec(
        prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
        layout="full", v0=v0, warm_refine=warm_refine)
    setup_s = round(time.time() - t0, 1)
    if nsteps != oracle_steps:
        _, v_dev, _ = device_steps_per_sec(
            prob, dt, nsteps=oracle_steps, mode="accurate",
            linsolver="schur", layout="full", v0=v0, ops=ops,
            warm_refine=warm_refine)
    # unrefined twin: the solver-tolerance-floor fast configuration
    # (same kernels,
    # no per-step residual round) — costs exactly ~2x less
    sps_fast = rel_fast = None
    if warm_refine:
        sps_fast, _, _ = device_steps_per_sec(
            prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
            layout="full", v0=v0, ops=ops, warm_refine=0)
        _, vf300, _ = device_steps_per_sec(
            prob, dt, nsteps=oracle_steps, mode="accurate",
            linsolver="schur", layout="full", v0=v0, ops=ops,
            warm_refine=0)
    _, v64 = baseline_loop(prob, dt, nsteps=oracle_steps, v0=v0,
                           return_v=True)
    rel = float(np.linalg.norm(v_dev - v64) / np.linalg.norm(v64))
    if sps_fast is not None:
        rel_fast = float(np.linalg.norm(vf300 - v64)
                         / np.linalg.norm(v64))
    base = baseline_loop(prob, dt, nsteps=base_steps, v0=v0)
    k = f"l{level}"
    out = {k: round(sps_, 2), k + "_base": round(base, 2),
           k + "_dofs": int(len(prob.invinds) + prob.np_cond),
           k + "_rel_err": rel, k + "_setup_s": setup_s,
           k + "_vs_baseline": round(sps_ / base, 2),
           k + "_warm_refine": warm_refine}
    if sps_fast is not None:
        out[k + "_fast"] = round(sps_fast, 2)
        out[k + "_fast_vs_baseline"] = round(sps_fast / base, 2)
        out[k + "_fast_rel_err"] = rel_fast
    return out


def level_steps_per_sec(level, base_steps=20, oracle_steps=300,
                        warm_refine=1):
    """Level-N CNAB on the device via the block-Schur solver; isolated in
    a subprocess because historic axon runtime faults at lvl2+ sizes
    killed the worker (docs/ROADMAP.md)."""
    import subprocess
    import sys

    code = (f"import json, bench;"
            f"print(json.dumps(bench._level_body({level},"
            f" base_steps={base_steps}, oracle_steps={oracle_steps},"
            f" warm_refine={warm_refine})))")
    res = {f"l{level}": None}
    for _attempt in range(3):
        # each attempt is bounded by the subprocess timeout below; tell
        # the stall monitor to stand down for that long
        _phase(f"level{level}_attempt{_attempt}", grace_s=2500.0)
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=2400,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = out.stdout.strip().splitlines()[-1]
            res = json.loads(line)
        except Exception:
            continue
        if not res.get("slow_mode"):
            return res
    return res


# Progressive result accumulation: main() fills this dict milestone by
# milestone so that the deadline thread (or the degraded wedged-tunnel
# path) can emit whatever has been measured instead of nothing.  The
# driver parses the LAST JSON line of stdout — emitting exactly once is
# enforced by the flag.
_RESULTS = {"metric": "cnab_steps_per_sec_cylwake2d", "value": None,
            "unit": "steps/s", "vs_baseline": None}
_EMITTED = False


def _emit(partial=False):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if partial:
        _RESULTS["partial"] = True
    print(json.dumps(_RESULTS), flush=True)


def _start_deadline_thread():
    """Bound the whole bench: a mid-run tunnel death wedges a dispatch
    with no error and no CPU (docs/PERF_NOTES.md section 13), which
    would otherwise hang past the driver's timeout and lose every
    number already measured.  After DNS_TPU_BENCH_DEADLINE_S (default
    7000 s) the thread emits the partial JSON and hard-exits."""
    import threading

    deadline = float(os.environ.get("DNS_TPU_BENCH_DEADLINE_S", "7000"))

    def watch():
        time.sleep(deadline)
        _emit(partial=True)
        os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


# Phase-aware stall watchdog: the global deadline above is the last
# line of defense, but a mid-run wedge (observed: zero CPU for 15+ min
# right after the canary, socket idle) should not cost the full 7000 s.
# main() stamps a heartbeat before each phase with a grace period sized
# to that phase; the monitor trips when a phase overruns its grace.
_HEARTBEAT = {"t": time.time(), "grace": 1e18, "label": "start"}


def _phase(label, grace_s=900.0):
    _HEARTBEAT.update(t=time.time(), grace=float(grace_s), label=label)


def _start_stall_thread():
    """On a phase overrun: if nothing has been measured yet, re-exec
    the bench (a fresh process un-wedges the tunnel in practice, and
    the compile cache makes the retry cheap); otherwise emit the
    partial JSON and exit, preserving what was measured."""
    import sys
    import threading

    def watch():
        while True:
            time.sleep(20)
            if time.time() - _HEARTBEAT["t"] <= _HEARTBEAT["grace"]:
                continue
            tries = int(os.environ.get("DNS_TPU_BENCH_STALL_RETRY", "0"))
            if _RESULTS.get("value") is None and tries < 2:
                env = dict(os.environ,
                           DNS_TPU_BENCH_STALL_RETRY=str(tries + 1))
                os.execve(sys.executable,
                          [sys.executable] + sys.argv, env)
            _RESULTS["stalled_at"] = _HEARTBEAT["label"]
            _emit(partial=True)
            os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


def _degraded_main():
    """Tunnel-down fallback: the parent process's first dispatch wedged
    through every re-exec retry, so NOTHING can run on the device in
    this process.  Levels still run in fresh subprocesses (each bails
    out via its own first-dispatch watchdog if the tunnel stays down);
    lvl1 fills the headline fields from its subprocess twin."""
    _RESULTS["degraded"] = "wedged parent process; subprocess-only"
    l1 = level_steps_per_sec(1)
    if l1.get("l1"):
        _RESULTS.update(value=l1["l1"], vs_baseline=l1["l1_vs_baseline"],
                        accurate_rel_err_300_steps=l1.get("l1_rel_err"),
                        dofs=l1.get("l1_dofs"),
                        setup_s=l1.get("l1_setup_s"))
    _RESULTS["level1"] = l1
    _RESULTS["level2"] = level_steps_per_sec(2)
    _RESULTS["level3"] = level_steps_per_sec(3, base_steps=12,
                                             oracle_steps=300)
    _emit()


def main():
    _arm_cache()
    _start_deadline_thread()
    _start_stall_thread()
    _phase("canary", grace_s=600.0)
    canary = _ensure_fast_process()
    if canary == -2.0:
        _degraded_main()
        return
    t0 = time.time()
    _phase("build")
    prob, dt = build()
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    # linsolver='auto' resolves to the banded block-Schur solver at
    # lvl1's 8.4k dofs (measured faster than the dense-inverse path at
    # BOTH refine settings: 1559/1208 vs 922 steps/s); the full layout
    # is the production scan layout
    ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                     linsolver="auto", layout="full")
    setup_s = round(time.time() - t0, 1)           # build + factorization
    # all runs start from the Stokes state (as solve_nse does via
    # start_ssstokes); an impulsive zero start imprints the solver
    # tolerance on the first O(1)-sized increment
    from dolfin_navier_scipy_tpu.solve import solve_nse

    _phase("stokes_init")
    v0 = np.asarray(solve_nse(prob=prob, t0=0.0, tE=dt, Nts=1,
                              start_ssstokes=True, save_every=None,
                              linsolver="schur")["iniv"])
    t0 = time.time()
    # accurate = banded + one warm-refine round (rel_err 4.3e-8 at
    # lvl1); fast = the same solver unrefined (2.5e-7).  Grace covers a
    # cache-cold remote compile (~180 s) with a wide margin.
    _phase("accurate_steps", grace_s=1200.0)
    dev, v_acc, ops = device_steps_per_sec(prob, dt, mode="accurate",
                                           v0=v0, ops=ops, warm_refine=1)
    first_run_s = round(time.time() - t0, 1)       # compile + first scan
    _RESULTS.update(value=round(dev, 2),
                    accurate_mode_steps_per_sec=round(dev, 2),
                    dofs=int(len(prob.invinds) + prob.np_cond),
                    setup_s=setup_s, first_run_s=first_run_s,
                    canary_gbps=round(canary, 1))
    _phase("fast_steps", grace_s=1200.0)
    dev_fast, v_fast, _ = device_steps_per_sec(prob, dt, mode="fast",
                                               v0=v0, ops=ops)
    # trajectory accuracy vs the f64 splu oracle over 300 steps
    _, _, _ = dev, dev_fast, v_fast
    _phase("oracle_300")
    _, v64 = baseline_loop(prob, dt, nsteps=300, v0=v0, return_v=True)
    _phase("accurate_300")
    _, v_dev, _ = device_steps_per_sec(prob, dt, nsteps=300,
                                       mode="accurate", v0=v0, ops=ops,
                                       warm_refine=1)
    rel = float(np.linalg.norm(v_dev - v64) / np.linalg.norm(v64))
    _RESULTS["accurate_rel_err_300_steps"] = rel
    _phase("fast_300")
    _, v_devf, _ = device_steps_per_sec(prob, dt, nsteps=300,
                                        mode="fast", v0=v0, ops=ops)
    rel_fast = float(np.linalg.norm(v_devf - v64) / np.linalg.norm(v64))
    # the single-core host baseline jitters ~15% run-to-run; median of 3
    _phase("splu_baseline")
    base = float(np.median([baseline_loop(prob, dt, nsteps=100, v0=v0)
                            for _ in range(3)]))
    _RESULTS.update(vs_baseline=round(dev / base, 2),
                    baseline_scipy_splu=round(base, 2),
                    accurate_vs_baseline=round(dev / base, 2),
                    fast_mode_steps_per_sec=round(dev_fast, 2),
                    fast_rel_err_300_steps=rel_fast)
    # session-quality normalizer: per-application in-scan cost (the
    # tunneled TPU's windows differ by multiples run-to-run; steps/s
    # is only comparable across sessions via this number)
    _phase("app_us")
    app_us = measure_app_us(prob, dt)
    _RESULTS["session_app_us_lvl1"] = round(app_us, 1)
    # batched-trajectory throughput (parameter-sweep mode): aggregate
    # trajectory-steps/s for B vmapped members of one scan
    ens = {}
    for B in (16, 64, 128):
        try:
            _phase(f"ensemble_B{B}", grace_s=1200.0)
            agg = ensemble_traj_steps_per_sec(prob, dt, v0, B=B)
            ens[f"B{B}_traj_steps_per_sec"] = round(agg, 1)
            ens[f"B{B}_vs_serial_device"] = round(agg / dev, 2)
            ens[f"B{B}_vs_baseline"] = round(agg / base, 1)
        except Exception as e:   # never let the sweep kill the bench
            ens[f"B{B}_error"] = repr(e)[:120]
    try:
        # dense-inverse comparison point (the pre-round-3 ensemble path)
        _phase("ensemble_B64_dense", grace_s=1200.0)
        ens["B64_dense_traj_steps_per_sec"] = round(
            ensemble_traj_steps_per_sec(prob, dt, v0, B=64,
                                        scan="dense"), 1)
    except Exception as e:
        ens["B64_dense_error"] = repr(e)[:120]
    _RESULTS["ensemble"] = ens
    l2 = level_steps_per_sec(2)
    _RESULTS["level2"] = l2
    # lvl3 floors at ~3e-6 trajectory error regardless of refinement
    # (refine=1: 3.8e-6 at 36.95 steps/s; refine=2: 2.7e-6 at 26.2 —
    # one round contracts the 4e-3 unrefined solve floor by ~1e-3,
    # the second buys almost nothing): the residual is the f32 KERNEL
    # floor of the 113k-dof mesh, not solve tolerance.  refine=1 is
    # therefore the honest headline config at lvl3.
    l3 = level_steps_per_sec(3, base_steps=12, oracle_steps=300)
    _RESULTS["level3"] = l3
    _emit()


if __name__ == "__main__":
    main()
