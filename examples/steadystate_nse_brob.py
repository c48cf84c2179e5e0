"""Steady NSE with Robin-penalized boundary control — twin of the
reference's tests/steadystate_nse_brob.py: ``A += 1/palpha Arob``, a
constant control ``brhs = 1.5 B[:,0] - 1.5 B[:,1]`` folded into the
rhs, then the plain Picard->Newton steady solve."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.control import apply_robin_penalty
from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
)
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse


def testit(meshlvl=1, Re=60, charvel=0.2, palpha=1e-5,
           nnwtnstps=9, npcrdstps=5, nwtn_tol=1e-13):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel,
                                bccontrol=True)
    Brob = apply_robin_penalty(prob, palpha=palpha)   # A += 1/palpha Arob
    brhs = 1.5 * Brob[:, :1] - 1.5 * Brob[:, 1:]
    prob.fv = np.asarray(prob.fv).reshape(-1, 1) + np.asarray(brhs)
    (v, p), norms = solve_steadystate_nse(
        prob, return_vp=True, return_nwtnupd_norms=True,
        vel_pcrd_stps=npcrdstps, vel_nwtn_stps=nnwtnstps,
        vel_nwtn_tol=nwtn_tol)
    ld = LiftDragSurfForce(prob)
    cl, cd = ld.coefficients(v, p, charvel, 0.1)   # v = full (vwc) vector
    print(f"final Newton update norm: {norms[-1]:.3e}")
    print(f"controlled steady state: Cd={cd:.4f} Cl={cl:.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--palpha", type=float, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh, few iterations")
    args = ap.parse_args()
    if args.tiny:
        # tiny preset pairs the shortened Newton budget with a gentler
        # penalty and a REACHABLE tolerance so a clean run stays
        # warning-free (a "benign" not-converged warning would mask
        # real regressions); the production default keeps the
        # reference's palpha=1e-5
        testit(meshlvl=0, Re=40,
               palpha=(1e-3 if args.palpha is None else args.palpha),
               nnwtnstps=8, npcrdstps=2, nwtn_tol=1e-8)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re,
               palpha=(1e-5 if args.palpha is None else args.palpha))
