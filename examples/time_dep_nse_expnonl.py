"""Semi-explicit time integration of the cylinder wake with Paraview
output — twin of the reference's tests/time_dep_nse_expnonl.py."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
)
from dolfin_navier_scipy_tpu.solve import solve_nse
from dolfin_navier_scipy_tpu.utils.io import Timer
from dolfin_navier_scipy_tpu.utils.vtk import PVDWriter


def testit(meshlvl=1, Re=60, charvel=0.2, t0=0.0, tE=1.0, Nts=2000,
           scheme="cnab", paraview=None, save_every=100):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    print(f"Re={prob.Re}  nu={prob.nu:.3e}  "
          f"NV+NP={len(prob.invinds) + prob.np_cond}")

    with Timer("time integration"):
        out = solve_nse(prob=prob, t0=t0, tE=tE, Nts=Nts,
                        start_ssstokes=True, time_int_scheme=scheme,
                        save_every=save_every)
    print(f"blow-up flag: {out['ffflag']}")

    ld = LiftDragSurfForce(prob)
    for i, t in enumerate(np.asarray(out["times"])):
        vf = np.asarray(prob.embed(out["vs"][i]))
        cl, cd = ld.coefficients(vf, np.asarray(out["ps"][i]),
                                 charvel=charvel, charlen=0.1)
        print(f"t={t:7.4f}  Cd={cd:9.5f}  Cl={cl:+9.6f}")

    if paraview:
        w = PVDWriter(paraview, prob)
        for i, t in enumerate(np.asarray(out["times"])):
            w.write(v_full=np.asarray(prob.embed(out["vs"][i])),
                    p=np.asarray(out["ps"][i]), t=float(t))
        w.close()
        print(f"paraview series written to {paraview}.pvd")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--tE", type=float, default=1.0)
    ap.add_argument("--Nts", type=int, default=2000)
    ap.add_argument("--scheme", choices=("cnab", "sbdf2"), default="cnab")
    ap.add_argument("--paraview", default=None,
                    help="prefix for .pvd/.vtu output")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh, a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=0, Re=40, tE=0.005, Nts=10, scheme=args.scheme,
               save_every=5)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               Nts=args.Nts, scheme=args.scheme, paraview=args.paraview)
