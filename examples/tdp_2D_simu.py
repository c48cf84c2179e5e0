"""Rotating-cylinder Dirichlet control with in-loop observables — twin of
the reference's tests/tdp_2D_simu.py: the control callback protocol also
records drag/lift/torque/DeltaP along the trajectory."""

import argparse

import numpy as np

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.models import (
    LiftDragSurfForce,
    cylinderwake_problem,
    pressure_drop,
)
from dolfin_navier_scipy_tpu.solve import (
    DirichletControl,
    cnab,
    solve_steadystate_nse,
)


def testit(meshlvl=1, Re=60, charvel=0.2, tE=0.5, Nts=1000,
           rotamp=1.0, rotfreq=4.0):
    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel,
                                movingwallcntrl=True)
    dofs, stencil = prob.dircntrl[0]
    vss = solve_steadystate_nse(prob, verbose=False, vel_pcrd_stps=2,
                                vel_nwtn_stps=8, vel_nwtn_tol=1e-11)
    iniv = vss.ravel()[prob.invinds]

    def ufunc(t, v_full, p, memory, mode):
        return rotamp * jnp.sin(rotfreq * t), memory

    ctrl = DirichletControl(dofs=dofs, stencil=stencil, ufunc=ufunc)
    out = cnab(trange=np.linspace(0, tE, Nts + 1), prob=prob, inivel=iniv,
               controls=[ctrl], save_every=max(Nts // 10, 1))
    print(f"blow-up flag: {out['ffflag']}")

    # in-loop observables (the reference records these through the
    # mode-tagged controller callback, tdp_2D_simu.py:68-130)
    ld = LiftDragSurfForce(prob)
    for i, t in enumerate(np.asarray(out["times"])):
        om = rotamp * np.sin(rotfreq * t)
        # np.array (copy): asarray on a jax buffer is a READ-ONLY view
        vfull = np.array(prob.embed(out["vs"][i]))
        vfull[dofs] = om * stencil
        p = np.asarray(out["ps"][i])
        cl, cd = ld.coefficients(vfull, p, charvel=charvel, charlen=0.1)
        tq = ld.evatorque(vfull, p, center=(0.2, 0.2))
        dp = pressure_drop(prob, p)
        print(f"t={t:7.4f} omega={om:+.4f}  Cd={cd:8.4f}  Cl={cl:+8.5f}  "
              f"torque={tq:+.3e}  dP={dp:.5f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--tE", type=float, default=0.5)
    ap.add_argument("--Nts", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=40, tE=0.01, Nts=10)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               Nts=args.Nts)
