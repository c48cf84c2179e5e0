"""Channel flow with an observation operator and JSON output signals —
twin of the reference's tests/time_dep_nse_bigchannel.py (which pulls the
observation operator from distributed_control_fenics; here it is native,
models.functionals.observation_operator)."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import cylinderwake_problem
from dolfin_navier_scipy_tpu.models.functionals import observation_operator
from dolfin_navier_scipy_tpu.solve import solve_nse
from dolfin_navier_scipy_tpu.utils.io import save_output_json


def testit(meshlvl=1, Re=60, charvel=0.2, tE=0.5, Nts=1000, ny=4,
           outfile="results/bigchannel_sig.json"):
    geodata = None   # default DFG geometry; observation box in the wake
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    prob.geo.odcoo = dict(xmin=0.5, xmax=0.7, ymin=0.1, ymax=0.3)
    C = observation_operator(prob, ny=ny)
    Cc = C[:, prob.invinds]

    out = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=Nts,
                    start_ssstokes=True, save_every=max(Nts // 50, 1))
    tmesh = np.asarray(out["times"]).tolist()
    ylist = [list(Cc @ np.asarray(out["vs"][i]))
             for i in range(len(tmesh))]
    save_output_json(dict(tmesh=tmesh, outsig=ylist), fstring=outfile)
    print(f"{len(tmesh)} output samples of dim {2 * ny} -> {outfile}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--tE", type=float, default=0.5)
    ap.add_argument("--Nts", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: small channel, a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=40, tE=0.01, Nts=10, ny=2,
               outfile="results/bigchannel_sig_tiny.json")
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               Nts=args.Nts)
