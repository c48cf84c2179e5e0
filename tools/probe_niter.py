"""Iteration-count sweep for the banded w-space Schur step: steps/s +
rel_err vs the f64 splu oracle for (niter_warm, refine, niter_ref)
combinations — picks the cheapest configuration that holds the <=1e-6
trajectory regime.  Usage:
    python tools/probe_niter.py [level] [nsteps]
"""
import sys
import time

import numpy as np

import bench
from bench import build, _arm_cache, baseline_loop
from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 2
NSTEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 200

_arm_cache()
print(f"canary {bench._ensure_fast_process():.0f} GB/s", flush=True)
prob, dt = build(level=LEVEL)
vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac, jmat=prob.Jc,
                       jmatT=prob.JTc, rhsv=np.asarray(prob.fv).ravel(),
                       rhsp=np.asarray(prob.fp).ravel())
v0 = vp[: len(prob.invinds), 0]
_, v64 = baseline_loop(prob, dt, nsteps=NSTEPS, v0=v0, return_v=True)

ops = None
t0 = time.time()
for (nw, wr) in ((6, 1), (4, 1), (3, 1), (6, 0), (4, 0)):
    s, vdev, ops = bench.device_steps_per_sec(
        prob, dt, nsteps=NSTEPS, mode="accurate", linsolver="schur",
        layout="full", v0=v0, ops=ops, warm_refine=wr, niter_warm=nw)
    if time.time() - t0 > 0:
        print(f"setup+first {time.time() - t0:.1f}s", flush=True)
        t0 = -1e9
    rel = float(np.linalg.norm(vdev - v64) / np.linalg.norm(v64))
    print(f"niter_warm={nw} refine={wr}: {s:.1f} steps/s "
          f"= {1e3 / s:.2f} ms/step  rel_err={rel:.2e}", flush=True)
