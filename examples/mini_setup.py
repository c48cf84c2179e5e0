"""Quickstart — twin of the reference's tests/mini_setup.py: build the
cylinder-wake system, solve the steady NSE, and cross-check the pressure
recovered from the velocity."""

import numpy as np

from dolfin_navier_scipy_tpu.models import get_sysmats
from dolfin_navier_scipy_tpu.solve import (
    get_pfromv,
    solve_steadystate_nse,
)

N, Re, scheme = 1, 50, "TH"

femp, stokesmatsc, rhsd = get_sysmats(
    problem="cylinderwake", Re=Re, scheme=scheme, mergerhs=True,
    meshparams=dict(refinement_level=N))
prob = femp["problem"]

# ## Solve the steady-state NSE
v, p = solve_steadystate_nse(prob, return_vp=True, verbose=False)

# ## Test: recompute the p from the v
pfv = get_pfromv(v=np.asarray(v).ravel()[prob.invinds], prob=prob)

print("Number of inner velocity nodes: {0}".format(len(prob.invinds)))
print("Shape of the divergence matrix: ", stokesmatsc["J"].shape)
print("error in recomputed pressure: {0}".format(
    np.linalg.norm(np.asarray(pfv).ravel() - np.asarray(p).ravel())))
