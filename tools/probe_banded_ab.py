"""A/B probe: banded vs element-pipeline Schur PCG matvec, same session.

Session quality on the tunneled TPU varies by multiples, so only an
in-session comparison is meaningful.  Also prints the per-application
cost of one banded matvec vs one element matvec (slope method).
"""
import os
import sys
import time

import numpy as np

import bench
from bench import build, _arm_cache, device_steps_per_sec
from dolfin_navier_scipy_tpu.solve.timeint import _build_ops
from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ARMS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["element",
                                                         "banded"]

_arm_cache()
prob, dt = build(level=LEVEL)
vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac, jmat=prob.Jc,
                       jmatT=prob.JTc, rhsv=np.asarray(prob.fv).ravel(),
                       rhsp=np.asarray(prob.fp).ravel())
v0 = vp[:len(prob.invinds), 0]

import gc

for tag, banded in [("element", "0"), ("banded", "1")]:
    if tag not in ARMS:
        continue
    os.environ["DNS_TPU_BANDED"] = banded
    t0 = time.time()
    ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                     linsolver="schur", layout="full")
    setup = time.time() - t0
    print(f"[{tag}] setup {setup:.1f}s banded={ops.solver.Bblk is not None}",
          flush=True)
    for wr, it in [(0, 6), (1, 6)]:
        s, _, ops = device_steps_per_sec(
            prob, dt, nsteps=300, mode="accurate", linsolver="schur",
            layout="full", v0=v0, ops=ops, warm_refine=wr, niter_warm=it)
        print(f"[{tag}] refine={wr} niter={it}: {s:.1f} steps/s "
              f"= {1e3 / s:.2f} ms/step", flush=True)
    # both arms' dense factors at once exceed HBM at lvl3+
    del ops
    gc.collect()
