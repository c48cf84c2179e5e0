"""Self-convergence check of the time integrators by Nts-doubling —
twin of the reference's tests/tdp_convcheck.py:115-138."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import cylinderwake_problem
from dolfin_navier_scipy_tpu.solve import solve_nse, solve_steadystate_nse


def mnorm(prob, dv):
    return float(np.sqrt(abs(dv @ (prob.Mc @ dv))))


def testit(meshlvl=1, Re=50, charvel=0.2, tE=0.1, scheme="cnab",
           ntsref=512, ntslist=(64, 128, 256)):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    vss = solve_steadystate_nse(prob, verbose=False, vel_pcrd_stps=2,
                                vel_nwtn_stps=8, vel_nwtn_tol=1e-11)
    iniv = vss.ravel()[prob.invinds]

    def run(nts):
        out = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=nts, iniv=iniv,
                        time_int_scheme=scheme, save_every=None)
        return np.asarray(out["v"])

    vref = run(ntsref)
    errs = []
    for nts in ntslist:
        e = mnorm(prob, run(nts) - vref)
        errs.append(e)
        print(f"Nts={nts:6d}  M-norm err vs Nts={ntsref}: {e:.4e}")
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    print(f"observed orders: {['%.2f' % r for r in rates]} (expect ~2)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=50)
    ap.add_argument("--tE", type=float, default=0.1)
    ap.add_argument("--scheme", choices=("cnab", "sbdf2"), default="cnab")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: short horizon, small Nts list")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=50, tE=0.02, scheme=args.scheme,
               ntsref=64, ntslist=(16, 32))
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               scheme=args.scheme)
