"""lvl-N w-space production step: steps/s + rel_err vs the f64 splu
oracle (the bench recipe, shortened).  Usage:
    python tools/probe_wspace.py [level] [nsteps]
"""
import sys
import time

import numpy as np

import bench
from bench import build, _arm_cache, device_steps_per_sec, baseline_loop
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
t0 = time.time()
ops = None
for wr in (0, 1):
    s, vdev, ops = device_steps_per_sec(
        prob, dt, nsteps=NSTEPS, mode="accurate", linsolver="schur",
        layout="full", v0=v0, ops=ops, warm_refine=wr)
    if ops is not None and wr == 0:
        print(f"setup+first {time.time() - t0:.1f}s", flush=True)
    _, v64 = baseline_loop(prob, dt, nsteps=NSTEPS, v0=v0, return_v=True)
    rel = float(np.linalg.norm(vdev - v64) / np.linalg.norm(v64))
    print(f"refine={wr}: {s:.1f} steps/s = {1e3 / s:.2f} ms/step  "
          f"rel_err={rel:.2e}", flush=True)
