"""Probe: W truncation tolerance vs refine count — the bytes/accuracy
trade of the banded inverse.

W's window scales ~log(1/wtol) (exponential decay), and a refine round
absorbs the truncation QUADRATICALLY (docs/PERF_NOTES.md section 12).
So a looser wtol shrinks the dominant HBM stream of the lvl2+ step
(W is 588 MB at lvl2 with wtol=1e-5) *and* the W build cost, while
refine keeps the trajectory at the f32 floor — if the quadratic
absorption actually holds at trajectory level.  Measure it.

Run ALONE on the TPU host.  Usage: python tools/probe_wtol.py [level]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main(level=2):
    bench._arm_cache()
    if not bench._first_dispatch_watchdog():
        print("WEDGED first dispatch — rerun", flush=True)
        return
    g = bench._canary_gbps()
    print(f"canary: {g:.0f} GB/s", flush=True)
    if g < bench._SLOW_MODE_GBPS:
        print("SLOW MODE process — rerun", flush=True)
        return

    prob, dt = bench.build(level=level)
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[: len(prob.invinds), 0]
    print("oracle (f64 splu, 300 steps)...", flush=True)
    _, v64 = bench.baseline_loop(prob, dt, nsteps=300, v0=v0,
                                 return_v=True)
    nrm = np.linalg.norm(v64)

    import jax.numpy as jnp

    # PROBE_GRID overrides the sweep: "wtol:r,r;wtol:r,r"
    grid = os.environ.get("PROBE_GRID",
                          "1e-5:1,2;3e-4:1,2;3e-3:1,2")
    cases = [(w, tuple(int(r) for r in rs.split(",")))
             for w, rs in (c.split(":") for c in grid.split(";"))]
    dtags = ("f32", "bf16") if os.environ.get(
        "PROBE_BF16", "1") != "0" else ("f32",)
    for wtol, refines in cases:
        os.environ["DNS_TPU_WINV_TOL"] = wtol
        t0 = time.time()
        ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                         linsolver="schur", layout="full")
        su = time.time() - t0
        slv = ops.solver
        ww = getattr(slv, "_ww", 0)
        wmb = 0 if slv.Wb is None else slv.Wb.nbytes / 1e6
        print(f"wtol={wtol}: ww={ww} W={wmb:.0f} MB setup={su:.0f}s",
              flush=True)
        wb_f32 = slv.Wb
        for tag in dtags:
            if tag == "bf16":
                if wb_f32 is None:
                    continue
                slv.Wb = wb_f32.astype(jnp.bfloat16)
            for r in refines:
                sps, vd, _ = bench.device_steps_per_sec(
                    prob, dt, nsteps=300, mode="accurate",
                    linsolver="schur", layout="full", v0=v0, ops=ops,
                    warm_refine=r)
                rel = float(np.linalg.norm(vd - v64) / nrm)
                print(f"  W={tag} refine={r}: {sps:8.1f} steps/s  "
                      f"rel_err={rel:.2e}", flush=True)
        slv.Wb = wb_f32


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
