"""Schaefer-Turek 3D-1Z at LEVEL-1 in-plane resolution (nz=8):
in-plane convergence confirmation for the published-interval regression
(tests/test_3d.py).  Long single-core host-sparse steady solve — run in
background, ~1-2 h expected (docs/ROADMAP.md)."""
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from dolfin_navier_scipy_tpu.models.cylinderwake3d import (  # noqa: E402
    cylinderwake3d_problem,
)
from dolfin_navier_scipy_tpu.models.functionals import (  # noqa: E402
    LiftDragSurfForce,
)
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse  # noqa: E402

t0 = time.time()
prob = cylinderwake3d_problem(level=1, nz=8, nu=1e-3, charvel=0.2,
                              paraboloid_inflow=True, zslip=False,
                              length=2.5, center=(0.5, 0.2))
print(f"built: nv={len(prob.invinds)} np={prob.np_cond} "
      f"({time.time()-t0:.0f}s)", flush=True)
v, p = solve_steadystate_nse(prob, return_vp=True, verbose=True,
                             vel_pcrd_stps=2, vel_nwtn_stps=8,
                             vel_nwtn_tol=1e-10)
ld = LiftDragSurfForce(prob)
lift, drag = ld.evaliftdragforce(v, p)
Ubar, D, H = 0.2, 0.1, 0.41
fac = 2.0 / (Ubar ** 2 * D * H)
pf = np.concatenate([np.asarray(p).ravel(), [0.0]])
dp = prob.space.eval_pressure(
    pf, np.array([(0.45, 0.2, 0.205), (0.55, 0.2, 0.205)]))
print(f"3D-1Z lvl1 nz=8: cD={fac*drag:.5f} cL={fac*lift:.6f} "
      f"dP={float(dp[0]-dp[1]):.6f} wall={time.time()-t0:.0f}s",
      flush=True)
