"""Steady state at higher Re via Reynolds-number continuation — twin of
the reference's tests/steadystate_generic.py:16-50: solve a sequence of
increasing Re, warm-starting Newton from the previous solution."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
    pressure_drop,
)
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse


def testit(meshlvl=1, Re=60, charvel=0.2, relist=None):
    relist = relist or [20, 40, Re]
    vel_start = None
    for re in relist:
        prob = cylinderwake_problem(level=meshlvl, Re=re, charvel=charvel)
        (v, p), norms = solve_steadystate_nse(
            prob, return_vp=True, verbose=False,
            vel_pcrd_stps=(2 if vel_start is None else 0),
            vel_nwtn_stps=10, vel_nwtn_tol=1e-11,
            vel_start_nwtn=vel_start, return_nwtnupd_norms=True)
        vel_start = v
        ld = LiftDragSurfForce(prob)
        cl, cd = ld.coefficients(v, p, charvel=charvel, charlen=0.1)
        print(f"Re={re:6.1f}: {len(norms)} Newton steps "
              f"(last {norms[-1]:.1e})  Cd={cd:.5f} Cl={cl:+.6f} "
              f"dP={pressure_drop(prob, p):.5f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh, short Re list")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=0, Re=40, relist=[20, 40])
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re)
