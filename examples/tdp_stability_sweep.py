"""Empirical CNAB stability bound: sweep Nts downwards until blow-up —
the reference records "4200 was OK with CNAB, 4000 not" for tE=4, Re=40
on its karman lvl1 mesh (tests/start-generic-tdp-sim.sh:7-10).  The
blow-up detector (check_ff_maxv) flags the diverged runs."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import cylinderwake_problem
from dolfin_navier_scipy_tpu.solve import solve_nse


def testit(meshlvl=1, Re=40, charvel=0.2, tE=4.0,
           ntslist=(6000, 5000, 4200, 4000, 3500, 3000)):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    for nts in ntslist:
        out = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=nts,
                        start_ssstokes=True, precision="fast",
                        save_every=None, check_ff_maxv=1e8)
        vmax = float(np.abs(np.asarray(out["v"])).max())
        print(f"Nts={nts:6d} (dt={tE / nts:.2e}): "
              f"{'BLOW-UP' if out['ffflag'] else 'stable'}  |v|max={vmax:.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=40)
    ap.add_argument("--tE", type=float, default=4.0)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: one short stable run")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=40, tE=0.02, ntslist=(50,))
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE)
