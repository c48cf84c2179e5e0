"""DFG 2D-1 steady benchmark driver (Schaefer/Turek, Re=20).

Twin of the reference's tests/steadystate_schaefer-turek_2D-1.py: solve
the steady cylinder wake and print Cd/Cl/DeltaP against the published
featflow values.
"""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
    pressure_drop,
)
from dolfin_navier_scipy_tpu.residual_checks import get_steady_state_res
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse
from dolfin_navier_scipy_tpu.utils.io import Timer


def testit(meshlvl=1, nu=1e-3, charvel=0.2, rho=1.0):
    prob = cylinderwake_problem(level=meshlvl, nu=nu, charvel=charvel)
    NV, NP = len(prob.invinds), prob.np_cond
    print(f"NV + NP : {NV} + {NP} = {NV + NP}")

    with Timer("steady solve"):
        (v, p), norms = solve_steadystate_nse(
            prob, return_vp=True, vel_pcrd_stps=3, vel_nwtn_stps=10,
            vel_nwtn_tol=1e-12, return_nwtnupd_norms=True, verbose=True)

    res = get_steady_state_res(prob, rho=rho)
    R = res(v.ravel(), p.ravel())
    print(f"two norm of the inner res: {np.linalg.norm(R[prob.invinds])}")

    # residual-trick functionals (problem_setups.py:1107-1197)
    ld = LiftDragSurfForce(prob, rho=rho)
    cl, cd = ld.coefficients(v, p, charvel=charvel, charlen=0.1)
    dp = pressure_drop(prob, p)
    print("Computed:")
    print(f"Cl: {cl}")
    print(f"Cd: {cd}")
    print(f"Delta P: {dp}")
    print("\nvalues from Schaefer/Turek as in")
    print("www.featflow.de/en/benchmarks/cfdbenchmarking/flow/"
          "dfg_benchmark1_re20.html:")
    print("Cl: 0.010618948146")
    print("Cd: 5.57953523384")
    print("Delta P: 0.11752016697")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--nu", type=float, default=1e-3)
    ap.add_argument("--charvel", type=float, default=0.2)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=0)
    else:
        testit(meshlvl=args.meshlvl, nu=args.nu, charvel=args.charvel)
