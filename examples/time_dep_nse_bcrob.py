"""Unsteady flow with Robin-penalized boundary control — twin of the
reference's tests/time_dep_nse_bcrob.py: ``A += 1/palpha Arob`` and a
sinusoidal control signal through ``B = 1/palpha Brob``."""

import argparse

import numpy as np

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.control import apply_robin_penalty
from dolfin_navier_scipy_tpu.models import cylinderwake_problem
from dolfin_navier_scipy_tpu.solve import solve_nse


def testit(meshlvl=1, Re=100, charvel=0.2, tE=1.0, Nts=2000, palpha=1e-5,
           zerocontrol=False):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel,
                                bccontrol=True)
    Brob = apply_robin_penalty(prob, palpha=palpha)
    if zerocontrol:
        Brob = 0.0 * Brob

    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    bdiff = jnp.asarray((Brob[:, 0] - Brob[:, 1]).ravel())

    out = solve_nse(
        prob=prob, t0=0.0, tE=tE, Nts=Nts, start_ssstokes=True,
        f_tdp=lambda t: fv + jnp.sin(t) * bdiff,
        save_every=max(Nts // 10, 1))
    print(f"blow-up flag: {out['ffflag']}")
    for i, t in enumerate(np.asarray(out["times"])):
        print(f"t={t:7.4f}  |v|={np.linalg.norm(np.asarray(out['vs'][i])):.6f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=100)
    ap.add_argument("--tE", type=float, default=1.0)
    ap.add_argument("--Nts", type=int, default=2000)
    ap.add_argument("--zerocontrol", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=60, tE=0.01, Nts=10,
               zerocontrol=args.zerocontrol)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               Nts=args.Nts, zerocontrol=args.zerocontrol)
