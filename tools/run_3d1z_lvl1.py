"""Schaefer-Turek 3D-1Z at LEVEL-1 in-plane resolution (nz=8):
in-plane convergence confirmation for the published-interval regression
(tests/test_3d.py::test_schaefer_turek_3d1z_published_intervals).

Mesh continuation makes the 122k-dof solve affordable on one host core:
solve level 0 (46k dofs, full Picard+Newton), P2-interpolate onto the
level-1 space (fem.interpolate_velocity), then run Newton-only — a
couple of 122k splu factorizations instead of a cold ~1-2 h sweep
(docs/ROADMAP.md).  The reference has no mesh continuation (only Re/nu
continuation, tests/steadystate_generic.py:16-50) and cannot compute 3D
lift/drag at all (problem_setups.py:1362).
"""
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from dolfin_navier_scipy_tpu.fem import interpolate_velocity  # noqa: E402
from dolfin_navier_scipy_tpu.models.cylinderwake3d import (  # noqa: E402
    cylinderwake3d_problem,
)
from dolfin_navier_scipy_tpu.models.functionals import (  # noqa: E402
    LiftDragSurfForce,
)
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse  # noqa: E402

KW = dict(nz=8, nu=1e-3, charvel=0.2, paraboloid_inflow=True,
          zslip=False, length=2.5, center=(0.5, 0.2))


def coeffs(prob, v, p):
    ld = LiftDragSurfForce(prob)
    lift, drag = ld.evaliftdragforce(v, p)
    Ubar, D, H = 0.2, 0.1, 0.41
    fac = 2.0 / (Ubar ** 2 * D * H)
    pf = np.concatenate([np.asarray(p).ravel(), [0.0]])
    dp = prob.space.eval_pressure(
        pf, np.array([(0.45, 0.2, 0.205), (0.55, 0.2, 0.205)]))
    return fac * drag, fac * lift, float(dp[0] - dp[1])


t0 = time.time()
p0 = cylinderwake3d_problem(level=0, **KW)
print(f"lvl0 built: nv={len(p0.invinds)} np={p0.np_cond} "
      f"({time.time()-t0:.0f}s)", flush=True)
v0, q0 = solve_steadystate_nse(p0, return_vp=True, verbose=True,
                               vel_pcrd_stps=2, vel_nwtn_stps=8,
                               vel_nwtn_tol=1e-10)
cD0, cL0, dP0 = coeffs(p0, v0, q0)
print(f"3D-1Z lvl0 nz=8: cD={cD0:.5f} cL={cL0:.6f} dP={dP0:.6f} "
      f"wall={time.time()-t0:.0f}s", flush=True)

t1 = time.time()
p1 = cylinderwake3d_problem(level=1, **KW)
print(f"lvl1 built: nv={len(p1.invinds)} np={p1.np_cond} "
      f"({time.time()-t1:.0f}s)", flush=True)
vw = interpolate_velocity(np.asarray(v0).ravel(), p0.space, p1.space)
v1, q1 = solve_steadystate_nse(p1, return_vp=True, verbose=True,
                               vel_start_nwtn=vw, vel_pcrd_stps=0,
                               vel_nwtn_stps=4, vel_nwtn_tol=1e-9)
cD1, cL1, dP1 = coeffs(p1, v1, q1)
print(f"3D-1Z lvl1 nz=8: cD={cD1:.5f} cL={cL1:.6f} dP={dP1:.6f} "
      f"wall={time.time()-t1:.0f}s (total {time.time()-t0:.0f}s)",
      flush=True)
