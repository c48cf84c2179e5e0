"""Newton-in-time warm-started from a stored trajectory — twin of the
reference's tests/time_dep_nse_linearizations.py:35-60: a first implicit
run stores its trajectory; the second run linearizes about it and
converges in one sweep."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import cylinderwake_problem
from dolfin_navier_scipy_tpu.solve import solve_nse


def testit(meshlvl=0, Re=40, charvel=0.2, tE=0.1, Nts=100):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    first = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=Nts,
                      start_ssstokes=True, treat_nonl_explicit=False,
                      vel_nwtn_stps=5, vel_nwtn_tol=1e-11,
                      save_every=None, verbose=True)
    print("cold-start Newton norms:", ["%.2e" % n
                                       for n in first["nwtn_norms"]])
    warm = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=Nts,
                     start_ssstokes=True, treat_nonl_explicit=False,
                     lin_vel_point=np.asarray(first["v_traj"]),
                     vel_nwtn_stps=2, vel_nwtn_tol=1e-11,
                     save_every=None, verbose=True)
    print("warm-start Newton norms:", ["%.2e" % n
                                       for n in warm["nwtn_norms"]])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=0)
    ap.add_argument("--Re", type=float, default=40)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh, a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=0, Re=40, tE=0.01, Nts=10)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re)
