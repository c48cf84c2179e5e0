"""Headline benchmark: CNAB time-integration throughput on the DFG
cylinder wake (the reference's 2D-2 configuration: Re=100, charvel=1).

Prints at least ONE JSON line; the driver parses the LAST one.  The
bench emits a minimal line IMMEDIATELY at startup and re-emits the
full (progressively enriched) result dict after every milestone, so a
mid-run kill can never lose what was already measured:
    {"metric": ..., "value": steps/s (device), "unit": "steps/s",
     "vs_baseline": speedup over the reference-style scipy-splu loop,
     "level2": {...}, "level3": {...}, ...}

The baseline twin reproduces the reference's per-step recipe
(time_int_utils.py:104-143): one scipy ``splu`` factorization reused
for all steps + per-step convection re-assembly (host, vectorized
numpy — *faster* than the reference's FEniCS round trip, so the
reported speedup is conservative).

ARCHITECTURE (round 4, after BENCH_r03 was lost to a wedged tunnel):
the parent process NEVER touches the device.  Every measurement runs
in a bounded subprocess with its own first-dispatch watchdog (the
tunneled runtime occasionally hangs a process's first dispatch forever
— docs/PERF_NOTES.md section 13) and slow-mode canary (section 9);
wedged/slow subprocesses bail out in ~1 min and the parent retries in
a fresh process (the per-process lottery) or marks the tunnel wedged.
Worst case with a dead tunnel: the startup JSON is out at t=0 and the
``"wedged": true`` line within ~3 min.  Budgets are sized so the whole
bench ends before ``DNS_TPU_BENCH_DEADLINE_S`` (default 1650 s) under
ANY failure mode.

ROUND 5 (after lvl3 went unrecorded for the third time): lvl3 is SPLIT
— a CPU-pinned host half (problem + Stokes start + the timed f64 splu
oracle, cached under .bench_cache/ so retries are free) and a device
half that starts W-LESS (the lvl3 banded-W build aborts some tunnel
runtimes) with a 100-step window; it runs SECOND, right after lvl1,
while the full retry budget is still available, and a TIMEOUT now
triggers the same W-less retry as a crash.

Accuracy/measurement notes (unchanged from round 3): the device loop
is the INCREMENT-form CNAB step (solve/timeint.py); ``accurate`` runs
the banded w-space solver with one residual-refine round per step and
reports steps/s and rel_err (vs the f64 splu oracle over 300 steps)
from the SAME configuration; the ``_fast`` twin (no refine) is ~2x.
The tunneled TPU's absolute throughput varies by MULTIPLES across
sessions (PERF_NOTES section 5); ``session_app_us_lvl1`` normalizes.
``lN_hbm_gbps``/``lN_pct_of_hbm_peak`` derive bytes-per-step from the
banded block shapes actually streamed each step (peak via
``DNS_TPU_HBM_PEAK_GBPS``, default 819 = v5e).
"""

import json
import os
import sys
import time

import numpy as np

# Older toolchains registered the tunneled-TPU plugin as platform
# "axon"; current ones register it as plain "tpu".  A stale
# JAX_PLATFORMS=axon pin then hard-fails backend init.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
    os.environ["JAX_PLATFORMS"] = ""

_HBM_PEAK_GBPS = float(os.environ.get("DNS_TPU_HBM_PEAK_GBPS", "819"))


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


def _first_dispatch_watchdog(timeout_s=None):
    """The tunneled runtime occasionally hangs a process's FIRST device
    dispatch indefinitely (no CPU, no error; the same code in a fresh
    process runs immediately — observed repeatedly on 2026-08-19).
    Run a tiny dispatch in a thread; if it does not complete in
    ``timeout_s`` the process is wedged — return False so the caller
    can bail out fast instead of burning its full subprocess timeout."""
    import threading

    import jax
    import jax.numpy as jnp

    if timeout_s is None:
        timeout_s = float(os.environ.get("DNS_TPU_BENCH_WATCHDOG_S", "60"))
    if jax.default_backend() == "cpu":
        return True
    done = threading.Event()

    def ping():
        if os.environ.get("DNS_TPU_BENCH_SIMULATE_WEDGE"):
            time.sleep(1e9)          # kill-test hook: fake a dead tunnel
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
# bounded retry.
_SLOW_MODE_GBPS = 50.0


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


def _tree_nbytes(x):
    import jax

    if x is None:
        return 0
    try:
        return sum(int(leaf.nbytes)
                   for leaf in jax.tree_util.tree_leaves(x)
                   if hasattr(leaf, "nbytes"))
    except Exception:
        return 0


def _stream_bytes_per_step(slv, conv_nbytes, refine, niter=None):
    """HBM bytes streamed by ONE production w-space CNAB step: the
    convection tail once, the banded diffusion matvec (Eblk) once, then
    the saddle solve's banded factors per :meth:`_solve_core_perm`'s
    application counts — W/Sinv/X each (1+refine) times, J (1+2*refine),
    J^T and the exact banded F (refine) times.  In the W-LESS config
    (``Wb is None`` — e.g. the lvl3 build-abort fallback) each velocity
    solve streams the F band once per PCG iteration instead of W once.
    State vectors are O(n) and negligible next to the O(n*bandwidth)
    factors (<2%), so they are left out; the estimate is therefore a
    slight UNDERcount and ``pct_of_hbm_peak`` a lower bound."""
    r = int(refine)
    b = int(conv_nbytes)
    b += _tree_nbytes(getattr(slv, "Eblk", None))

    def _pairfac(arr):
        # bf16 hi/lo stacks (low-bit storage, 2 or 3 levels): the
        # predictor streams only the hi rows (1/nparts of the stored
        # bytes), each refine round streams the full stack
        bs = getattr(slv, "_bs", 0)
        if (arr is not None and bs and arr.shape[1] > bs
                and arr.shape[1] % bs == 0):
            return 1.0 / (arr.shape[1] // bs) + r
        return 1.0 + r

    wb_arr = getattr(slv, "Wb", None)
    wb = _tree_nbytes(wb_arr)
    if wb:
        b += int(_pairfac(wb_arr) * wb)
    else:
        if niter is None:
            from dolfin_navier_scipy_tpu.solve.timeint import (
                _NITER_WARM,
            )

            niter = _NITER_WARM
        b += (1 + r) * niter * _tree_nbytes(getattr(slv, "Bblk", None))
    b += (1 + r) * _tree_nbytes(getattr(slv, "Sinv", None))
    xb_arr = getattr(slv, "Xb", None)
    b += int(_pairfac(xb_arr) * _tree_nbytes(xb_arr))
    b += (1 + 2 * r) * _tree_nbytes(getattr(slv, "Jb", None))
    b += r * _tree_nbytes(getattr(slv, "JTb", None))
    b += r * _tree_nbytes(getattr(slv, "Bblk", None))
    return b


def device_steps_per_sec(prob, dt, nsteps=1500, mode="accurate",
                         linsolver="auto", layout="inner", v0=None,
                         ops=None, warm_refine=0, niter_warm=None,
                         winv=None):
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
                         linsolver=linsolver, layout=layout, winv=winv)
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
        # bytes-per-step bookkeeping for the HBM-utilization fields
        # (read by _level_body); element-pipeline conv cost = its
        # gather/coefficient tables
        ops._bench_conv_nbytes = (int(bct.nbytes) if use_bct
                                  else _tree_nbytes(kern))
        ops._bench_split = split
        ops._bench_use_w = use_w

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


# ---------------------------------------------------------------------
# Subprocess bodies.  Each runs in a FRESH process (see module
# docstring), guards itself with the first-dispatch watchdog + slow-
# mode canary, and prints one JSON line for the parent to merge.
# ---------------------------------------------------------------------

def _guard():
    """Common subprocess prologue: arm the compile cache, catch a
    wedged first dispatch (bail in ~1 min: {"hang": true}) and the
    per-process slow mode ({"slow_mode": true}) so the parent can retry
    in a fresh process.  Returns the canary GB/s or the bail dict."""
    _arm_cache()
    import jax

    if not _first_dispatch_watchdog():
        return {"slow_mode": True, "hang": True}
    g = _canary_gbps()
    if jax.default_backend() != "cpu" and g < _SLOW_MODE_GBPS:
        return {"slow_mode": True, "canary_gbps": round(g, 1)}
    return g


def _level_body(level, nsteps=300, base_steps=20, oracle_steps=300,
                warm_refine=1):
    """Level-N measurement: steps/s + splu-twin baseline + trajectory
    rel_err vs the f64 splu oracle over ``oracle_steps`` from the
    Stokes state + HBM-utilization fields.

    ``warm_refine=1``: one short residual-correction round per step —
    the f32 Schur path's trajectory-error floor is the in-step solve
    tolerance (docs/PERF_NOTES.md), and the refinement buys the <=1e-6
    regime at ~2x the step cost; the reported steps/s is measured in
    the SAME configuration that delivers the reported rel_err."""
    import numpy as np

    g = _guard()
    if isinstance(g, dict):
        return g
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
    # (same kernels, no per-step residual round) — costs exactly ~2x
    # less
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
           k + "_warm_refine": warm_refine,
           k + "_canary_gbps": round(g, 1)}
    if sps_fast is not None:
        out[k + "_fast"] = round(sps_fast, 2)
        out[k + "_fast_vs_baseline"] = round(sps_fast / base, 2)
        out[k + "_fast_rel_err"] = rel_fast
    # HBM utilization: bytes streamed per step (banded block shapes) x
    # measured steps/s vs the chip's peak — the falsifiable "is this
    # fast" number (VERDICT r3).  Only defined for the production
    # banded w-space path.
    if getattr(ops, "_bench_use_w", False):
        bps = _stream_bytes_per_step(ops.solver, ops._bench_conv_nbytes,
                                     warm_refine)
        out[k + "_bytes_per_step"] = int(bps)
        out[k + "_hbm_gbps"] = round(bps * sps_ / 1e9, 1)
        out[k + "_pct_of_hbm_peak"] = round(
            100.0 * bps * sps_ / 1e9 / _HBM_PEAK_GBPS, 1)
        if sps_fast is not None:
            bps_f = _stream_bytes_per_step(ops.solver,
                                           ops._bench_conv_nbytes, 0)
            out[k + "_fast_hbm_gbps"] = round(bps_f * sps_fast / 1e9, 1)
            out[k + "_fast_pct_of_hbm_peak"] = round(
                100.0 * bps_f * sps_fast / 1e9 / _HBM_PEAK_GBPS, 1)
    return out


_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache")


def _level3_host_body(oracle_steps=100):
    """lvl3 HOST half (VERDICT r4 #1: the lvl3 number was lost three
    rounds running to device-side budget overruns): everything that
    does not need the TPU — the 112,840-dof problem build, the Stokes
    start, and ONE timed f64 splu oracle run that doubles as the
    baseline throughput measurement (the r4 design ran the oracle and
    the baseline separately) — runs in a CPU-pinned subprocess that
    cannot draw the tunnel lottery, and caches its arrays so device
    retries never pay for it again."""
    import numpy as np

    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(_CACHE_DIR, f"lvl3_host_o{oracle_steps}.npz")
    if os.path.exists(cache):
        try:
            d = np.load(cache)
            return {"l3_base": round(float(d["base_sps"]), 2),
                    "l3_dofs": int(d["dofs"]),
                    "l3_host_cached": True, "l3_host_cache": cache}
        except Exception:
            pass
    t0 = time.time()
    prob, dt = build(level=3)
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[: len(prob.invinds), 0]
    base, v64 = baseline_loop(prob, dt, nsteps=oracle_steps, v0=v0,
                              return_v=True)
    np.savez(cache, v0=v0, v64=v64, base_sps=base, dt=dt,
             dofs=len(prob.invinds) + prob.np_cond)
    return {"l3_base": round(base, 2),
            "l3_dofs": int(len(prob.invinds) + prob.np_cond),
            "l3_host_s": round(time.time() - t0, 1),
            "l3_host_cache": cache}


def _level3_device_body(nsteps=100, oracle_steps=100, warm_refine=1):
    """lvl3 DEVICE half: measure the production banded w-space CNAB at
    112,840 dofs on the real chip.  Starts in the W-LESS config
    (PCG-on-banded-F) unless DNS_TPU_WINV is set: the banded-W build at
    lvl3 shapes aborts the tunneled client on some runtimes
    (docs/PERF_NOTES.md section 18.2) and a crashed process here is the
    difference between a recorded number and a fourth consecutive
    empty lvl3 row.  The measured window is ``nsteps`` (=100: the
    r4 300-step window + per-config compiles did not fit any
    reasonable subprocess cap at lvl3 setup costs); rel_err comes from
    the same-length trajectory vs the host body's cached f64 oracle."""
    import numpy as np

    g = _guard()
    if isinstance(g, dict):
        return g
    cache = os.path.join(_CACHE_DIR, f"lvl3_host_o{oracle_steps}.npz")
    if not os.path.exists(cache):
        return {"need_host": True}
    d = np.load(cache)
    v0, v64 = d["v0"], d["v64"]
    t0 = time.time()
    prob, dt = build(level=3)
    assert abs(float(d["dt"]) - dt) < 1e-15
    winv = None if os.environ.get("DNS_TPU_WINV") else False
    sps_, v_dev, ops = device_steps_per_sec(
        prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
        layout="full", v0=v0, warm_refine=warm_refine, winv=winv)
    setup_s = round(time.time() - t0, 1)
    rel = float(np.linalg.norm(v_dev - v64) / np.linalg.norm(v64))
    base = float(d["base_sps"])
    out = {"l3": round(sps_, 2), "l3_rel_err": rel,
           "l3_setup_s": setup_s, "l3_nsteps": nsteps,
           "l3_vs_baseline": round(sps_ / base, 2),
           "l3_warm_refine": warm_refine,
           "l3_winv": bool(getattr(ops.solver, "Wb", None) is not None),
           "l3_canary_gbps": round(g, 1)}
    if getattr(ops, "_bench_use_w", False):
        bps = _stream_bytes_per_step(ops.solver, ops._bench_conv_nbytes,
                                     warm_refine)
        out["l3_bytes_per_step"] = int(bps)
        out["l3_hbm_gbps"] = round(bps * sps_ / 1e9, 1)
        out["l3_pct_of_hbm_peak"] = round(
            100.0 * bps * sps_ / 1e9 / _HBM_PEAK_GBPS, 1)
    return out


def _level3d_body(nz=4, nsteps=150, base_steps=6, oracle_steps=60):
    """3D bench row (VERDICT r3 missing #3): CNAB on the extruded 3D-1Z
    cylinder wake (level 0, ``nz`` layers, 24.5k dofs at nz=4) through
    the same production Schur scan.  The splu baseline twin collapses
    in 3D (fill-in: measured 0.4 steps/s vs 114 device = ~276x), so
    ``oracle_steps`` is kept short — the rel_err is still a 60-step
    trajectory comparison against f64 splu."""
    import numpy as np

    g = _guard()
    if isinstance(g, dict):
        return g
    t0 = time.time()
    from dolfin_navier_scipy_tpu.models.cylinderwake3d import (
        cylinderwake3d_problem,
    )

    prob = cylinderwake3d_problem(level=0, nz=nz, nu=1e-3, charvel=0.2,
                                  paraboloid_inflow=True, zslip=False,
                                  length=2.5, center=(0.5, 0.2))
    dt = 2.5e-4
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[: len(prob.invinds), 0]
    sps_, _, ops = device_steps_per_sec(
        prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
        layout="full", v0=v0, warm_refine=1)
    setup_s = round(time.time() - t0, 1)
    _, v_dev, _ = device_steps_per_sec(
        prob, dt, nsteps=oracle_steps, mode="accurate",
        linsolver="schur", layout="full", v0=v0, ops=ops,
        warm_refine=1)
    _, v64 = baseline_loop(prob, dt, nsteps=oracle_steps, v0=v0,
                           return_v=True)
    rel = float(np.linalg.norm(v_dev - v64) / np.linalg.norm(v64))
    base = baseline_loop(prob, dt, nsteps=base_steps, v0=v0)
    out = {"l3d": round(sps_, 2), "l3d_base": round(base, 2),
           "l3d_dofs": int(len(prob.invinds) + prob.np_cond),
           "l3d_nz": nz, "l3d_rel_err": rel, "l3d_setup_s": setup_s,
           "l3d_vs_baseline": round(sps_ / base, 2),
           "l3d_canary_gbps": round(g, 1)}
    if getattr(ops, "_bench_use_w", False):
        bps = _stream_bytes_per_step(ops.solver, ops._bench_conv_nbytes,
                                     1)
        out["l3d_bytes_per_step"] = int(bps)
        out["l3d_hbm_gbps"] = round(bps * sps_ / 1e9, 1)
        out["l3d_pct_of_hbm_peak"] = round(
            100.0 * bps * sps_ / 1e9 / _HBM_PEAK_GBPS, 1)
    return out


def _level3dbig_body(oracle="l3dbig_lvl0_nz16_o20.npz"):
    """>=100k-dof 3D row (VERDICT r4 #7): CNAB on the extruded 3D
    cylinder wake at level 0 / nz=16 — 100,719 inner velocity + 5,950
    pressure dofs — through the production full-layout Schur scan (the
    flat-band gate correctly rejects 3D bandwidths at this size, so
    the element-pipeline PCG carries the velocity solves).

    The f64 splu oracle + reference-recipe baseline at this size cost
    ~50 min of single-core host work (splu factor 598 s, 88.6 s per
    backsolve — the reference recipe collapses in 3D, which is the
    point of the row), so they are generated ONCE on the exclusive
    bench host and committed under bench_oracles/ with provenance; the
    driver run measures the device half fresh and reports rel_err
    against the committed f64 trajectory.  ``l3dbig_host_cached``
    marks the provenance in the JSON."""
    import numpy as np

    g = _guard()
    if isinstance(g, dict):
        return g
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_oracles", oracle)
    if not os.path.exists(path):
        return {"skipped": "no committed oracle (bench_oracles/)"}
    d = np.load(path)
    t0 = time.time()
    from dolfin_navier_scipy_tpu.models.cylinderwake3d import (
        cylinderwake3d_problem,
    )

    prob = cylinderwake3d_problem(
        level=int(d["level"]), nz=int(d["nz"]), nu=1e-3, charvel=0.2,
        paraboloid_inflow=True, zslip=False, length=2.5,
        center=(0.5, 0.2))
    dt, nsteps = float(d["dt"]), int(d["nsteps"])
    sps_, v_dev, ops = device_steps_per_sec(
        prob, dt, nsteps=nsteps, mode="accurate", linsolver="schur",
        layout="full", v0=d["v0"], warm_refine=1)
    setup_s = round(time.time() - t0, 1)
    rel = float(np.linalg.norm(v_dev - d["v64"])
                / np.linalg.norm(d["v64"]))
    base = float(d["base_sps"])
    return {"l3dbig": round(sps_, 2), "l3dbig_base": round(base, 4),
            "l3dbig_dofs": int(d["dofs"]), "l3dbig_nz": int(d["nz"]),
            "l3dbig_rel_err": rel, "l3dbig_setup_s": setup_s,
            "l3dbig_nsteps": nsteps,
            "l3dbig_vs_baseline": round(sps_ / base, 1),
            "l3dbig_host_cached": True,
            "l3dbig_canary_gbps": round(g, 1)}


def _ensemble_body():
    """Batched-trajectory throughput (parameter-sweep mode): aggregate
    trajectory-steps/s for B vmapped members of one lvl1 scan."""
    g = _guard()
    if isinstance(g, dict):
        return g
    prob, dt = build(level=1)
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[: len(prob.invinds), 0]
    ens = {"canary_gbps": round(g, 1)}
    for B in (16, 64, 128):
        try:
            agg = ensemble_traj_steps_per_sec(prob, dt, v0, B=B)
            ens[f"B{B}_traj_steps_per_sec"] = round(agg, 1)
        except Exception as e:     # never let one B kill the sweep
            ens[f"B{B}_error"] = repr(e)[:120]
    return ens


def _appus_body():
    """Session-quality normalizer (see measure_app_us)."""
    g = _guard()
    if isinstance(g, dict):
        return g
    prob, dt = build(level=1)
    return {"session_app_us_lvl1": round(measure_app_us(prob, dt), 1)}


_BODIES = {
    "level1": "_level_body(1)",
    "level2": "_level_body(2)",
    "level3_host": "_level3_host_body()",
    "level3_device": "_level3_device_body()",
    "level3d": "_level3d_body()",
    "level3dbig": "_level3dbig_body()",
    "ensemble": "_ensemble_body()",
    "app_us": "_appus_body()",
}


# ---------------------------------------------------------------------
# Parent orchestrator: device-free, deadline-driven, emits after every
# milestone.
# ---------------------------------------------------------------------

_T0 = time.time()
# 1650: r4 measured 1402 s against the old 1500 with the lvl3 timeouts
# eating the reserve (VERDICT r4 weak #8 — budgets must survive one
# wedged retry per level); the driver tolerated >=1402 s, milestones
# emit progressively, and the backstop still exits 0 at the deadline.
_DEADLINE_S = float(os.environ.get("DNS_TPU_BENCH_DEADLINE_S", "1650"))

_RESULTS = {"metric": "cnab_steps_per_sec_cylwake2d", "value": 0.0,
            "unit": "steps/s", "vs_baseline": 0.0, "status": "starting"}


def _emit():
    """Print the CURRENT result dict as one JSON line.  Called after
    every milestone; the driver parses the LAST line, so re-emission
    only ever improves what gets recorded."""
    print(json.dumps(_RESULTS), flush=True)


def _remaining():
    return _DEADLINE_S - (time.time() - _T0)


def _run_subprocess(name, timeout_s, env=None):
    """Run one measurement body in a fresh subprocess; return its JSON
    dict, or {"hang": true} on timeout/garbage (a wedged subprocess
    usually bails itself via the watchdog before this timeout)."""
    import subprocess

    code = (f"import json, bench; "
            f"print(json.dumps(bench.{_BODIES[name]}))")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=dict(os.environ, **(env or {})))
    except subprocess.TimeoutExpired:
        return {"slow_mode": True, "hang": True, "timeout": True}
    for line in reversed(out.stdout.strip().splitlines() or [""]):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, TypeError):
            continue
    # the process EXITED without a JSON line — a crash (e.g. a "TPU
    # device error" killing the client mid-build), NOT a wedged
    # tunnel: retry in a fresh process but do NOT count toward the
    # wedged verdict (only timeouts/watchdog bails do)
    return {"slow_mode": True, "crashed": True,
            "stderr_tail": (out.stderr or "")[-200:]}


def _measure(name, cap_s, attempts=2, reserve_s=60.0, base_env=None):
    """Run ``name``'s body with retries (fresh process per attempt —
    the slow mode and the wedged first dispatch are per-process
    lotteries).  Deadline-aware: each attempt's timeout fits in the
    remaining budget; skipped entirely when too little remains.
    After a CRASH (process died without a JSON line — e.g. the lvl3
    banded-W build aborting the TPU client on some runtimes) OR a
    TIMEOUT (r4 postmortem: the W build can also wedge/overrun instead
    of crashing, and a timeout must reach the same fallback), the
    retry runs with DNS_TPU_WINV=0 (the W-less PCG-banded config,
    ~2x the step cost but build-safe).  ``base_env``: extra env for
    every attempt (e.g. pinning the lvl3 host half to the CPU backend
    so it cannot draw the tunnel lottery)."""
    res = None
    env = None
    for _ in range(attempts):
        rem = _remaining() - reserve_s
        if rem < 140.0:
            return res if res is not None else {"skipped_deadline": True}
        env_all = dict(base_env or {}, **(env or {}))
        res = _run_subprocess(name, timeout_s=min(cap_s, rem),
                              env=env_all or None)
        if not res.get("slow_mode"):
            if env:
                res = dict(res, winv_disabled=True)
            return res
        if res.get("crashed") or res.get("timeout"):
            env = {"DNS_TPU_WINV": "0"}
    return res


def _start_deadline_backstop():
    """Last line of defense: per-milestone timeouts are sized to end
    before the deadline, but if the parent itself wedges (it should
    never touch the device), emit what exists and exit."""
    import threading

    def watch():
        time.sleep(max(5.0, _DEADLINE_S - (time.time() - _T0)))
        _RESULTS["status"] = "deadline_backstop"
        _emit()
        os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


def main():
    _emit()                      # t=0: the artifact can never be empty
    _start_deadline_backstop()
    hangs = 0

    def note_hang(res):
        nonlocal hangs
        if res.get("hang"):
            hangs += 1
            if hangs >= 2:
                _RESULTS["wedged"] = True
        else:
            hangs = 0

    # Milestones in decreasing order of value; each merges + re-emits
    # immediately so a kill at any point preserves everything before it.
    l1 = _measure("level1", cap_s=420)
    note_hang(l1)
    _RESULTS["level1"] = l1
    if l1.get("l1"):
        _RESULTS.update(
            value=l1["l1"], vs_baseline=l1["l1_vs_baseline"],
            dofs=l1.get("l1_dofs"), setup_s=l1.get("l1_setup_s"),
            accurate_rel_err_300_steps=l1.get("l1_rel_err"),
            baseline_scipy_splu=l1.get("l1_base"),
            fast_mode_steps_per_sec=l1.get("l1_fast"),
            fast_rel_err_300_steps=l1.get("l1_fast_rel_err"),
            canary_gbps=l1.get("l1_canary_gbps"),
            hbm_gbps=l1.get("l1_hbm_gbps"),
            pct_of_hbm_peak=l1.get("l1_pct_of_hbm_peak"))
    _RESULTS["status"] = "level1_done"
    _emit()

    # lvl3 SECOND (r4 ran it fourth and the deadline/retry budget was
    # spent by then — three rounds without a recorded number): host
    # half first (CPU-pinned, cacheable, no tunnel lottery), then the
    # device half, W-less by default (PERF_NOTES 18.2).
    l3 = _measure("level3_host", cap_s=240, attempts=1,
                  base_env={"JAX_PLATFORMS": "cpu"})
    _RESULTS["level3"] = l3
    if not l3.get("slow_mode") and not l3.get("skipped_deadline"):
        # 620 s: measured in-session 572 s end-to-end in a slow-tunnel
        # window (289 s of that was the guard's first-dispatch +
        # canary compile), 28.0 steps/s at rel_err 1.2e-5 W-less
        l3dev = _measure("level3_device", cap_s=620, attempts=2)
        note_hang(l3dev)
        _RESULTS["level3"] = dict(l3, **l3dev)
    _RESULTS["status"] = "level3_done"
    _emit()

    for name, cap, att in (("level2", 440, 2), ("level3d", 480, 1)):
        if _RESULTS.get("wedged"):
            cap, att = 130, 1    # one cheap look in case it recovered
        res = _measure(name, cap_s=cap, attempts=att)
        note_hang(res)
        _RESULTS[name] = res
        _RESULTS["status"] = f"{name}_done"
        _emit()

    if not _RESULTS.get("wedged"):
        res = _measure("ensemble", cap_s=360, attempts=2)
        note_hang(res)
        _RESULTS["ensemble"] = res
        _RESULTS["status"] = "ensemble_done"
        _emit()

        # LAST on purpose: the >=100k 3D element-path setup ran past
        # 33 min in a contended in-session smoke (device Schur X build
        # at np=5950 over the 100k-dof 3D ELL operator) — it may well
        # not fit; everything above is already emitted if it doesn't.
        res = _measure("level3dbig", cap_s=560, attempts=1)
        note_hang(res)
        _RESULTS["level3dbig"] = res
        _RESULTS["status"] = "level3dbig_done"
        _emit()

        # session-quality diagnostic: opt-in only (it costs ~3 min and
        # the level rows already carry canary/HBM utilization fields)
        if os.environ.get("DNS_TPU_BENCH_APPUS"):
            res = _measure("app_us", cap_s=300, attempts=1)
            if res.get("session_app_us_lvl1") is not None:
                _RESULTS["session_app_us_lvl1"] = (
                    res["session_app_us_lvl1"])
            _RESULTS["status"] = "app_us_done"
            _emit()

    _RESULTS["status"] = "complete"
    _RESULTS["elapsed_s"] = round(time.time() - _T0, 1)
    _emit()


if __name__ == "__main__":
    main()
