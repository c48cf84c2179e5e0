"""Schaefer-Turek 3D-1Z steady benchmark driver (Re=20).

Computes the drag/lift coefficients and the pressure drop of the
steady flow around the z-spanning cylinder on the EXACT 1996 benchmark
geometry (2.5 x 0.41 x 0.41 channel, cylinder D=0.1 at x=0.5,
paraboloid inflow with Um=0.45) and prints them against the published
intervals (Schaefer & Turek 1996: cD 6.05..6.25, cL 0.008..0.010,
DeltaP 0.165..0.175).

The reference cannot run this case at all — its 3D setups raise
``NotImplementedError`` for lift/drag (problem_setups.py:1362); here
the residual-trick functionals are dimension-agnostic.

Two steady paths:

* ``--newton`` (default at small sizes): Picard -> Newton with one
  host-sparse splu per iteration (the reference's recipe) — fine to
  ~50k dofs, hours beyond.
* ``--pseudotime``: march the increment-form CNAB scan to its fixed
  point on the device (solve/steady.py:solve_steadystate_pseudotime) —
  the scalable path for level-1+ in-plane meshes (>100k dofs) where a
  3D splu is not practical.

Convergence series measured with this driver (exact geometry,
paraboloid inflow, no-slip z-walls):

    level 0, nz=2:   cD 6.91   (coarse-z anchor, tests/test_3d.py)
    level 0, nz=4:   cD 6.289
    level 0, nz=8:   cD 6.176  cL 0.00883  dP 0.17438   (all inside)

Usage::

    python examples/steadystate_3d1z.py --level 0 --nz 8
    python examples/steadystate_3d1z.py --level 1 --nz 8 --pseudotime
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--level", type=int, default=0,
                    help="in-plane O-grid refinement level")
    ap.add_argument("--nz", type=int, default=8,
                    help="extrusion layers over the 0.41 span")
    ap.add_argument("--pseudotime", action="store_true",
                    help="device pseudo-time march instead of "
                         "host-splu Newton")
    ap.add_argument("--newton", dest="pseudotime", action="store_false")
    ap.add_argument("--tol", type=float, default=None,
                    help="convergence tol (pseudotime rate / Newton "
                         "M-norm)")
    ap.add_argument("--dt", type=float, default=None,
                    help="pseudotime step (default: CFL-style)")
    ap.add_argument("--chunk", type=int, default=400)
    ap.add_argument("--max-rounds", type=int, default=120)
    ap.add_argument("--inivel-npy", default=None,
                    help="warm-start velocity (full-dof npy, e.g. a "
                         "coarser level interpolated)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the host-sparse "
                         "Newton path gains nothing from the "
                         "accelerator)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest extrusion, loose tol "
                         "(benchmark intervals are NOT reached)")
    args = ap.parse_args()
    if args.tiny:
        args.nz, args.level = 3, 0
        args.pseudotime, args.max_rounds = True, 3
        args.tol = args.tol or 1e-2
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dolfin_navier_scipy_tpu.models.cylinderwake3d import (
        cylinderwake3d_problem,
    )
    from dolfin_navier_scipy_tpu.models.functionals import (
        LiftDragSurfForce,
    )

    t0 = time.time()
    prob = cylinderwake3d_problem(level=args.level, nz=args.nz,
                                  nu=1e-3, charvel=0.2,
                                  paraboloid_inflow=True, zslip=False,
                                  length=2.5, center=(0.5, 0.2))
    nv, npc = len(prob.invinds), prob.np_cond
    print(f"3D-1Z level={args.level} nz={args.nz}: "
          f"nv={nv} np={npc} ({nv + npc} dofs), "
          f"setup {time.time() - t0:.1f}s", flush=True)

    inivel = None
    if args.inivel_npy:
        inivel = np.load(args.inivel_npy)

    t1 = time.time()
    if args.pseudotime:
        from dolfin_navier_scipy_tpu.solve import (
            solve_steadystate_pseudotime,
        )

        (v, p), info = solve_steadystate_pseudotime(
            prob, dt=args.dt, tol=args.tol or 1e-8, chunk=args.chunk,
            max_rounds=args.max_rounds, inivel=inivel, return_vp=True,
            return_info=True)
        print(f"pseudotime: {info['rounds']} rounds, dt={info['dt']:g}, "
              f"converged={info['converged']}", flush=True)
    else:
        from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

        v, p = solve_steadystate_nse(
            prob, return_vp=True, verbose=True, vel_pcrd_stps=2,
            vel_nwtn_stps=8, vel_nwtn_tol=args.tol or 1e-10,
            vel_start_nwtn=inivel)
    print(f"solve {time.time() - t1:.1f}s", flush=True)

    ld = LiftDragSurfForce(prob)
    lift, drag = ld.evaliftdragforce(v, p)
    Ubar, D, H = 0.2, 0.1, 0.41
    fac = 2.0 / (Ubar ** 2 * D * H)
    cD, cL = fac * drag, fac * lift
    pf = np.concatenate([np.asarray(p).ravel(), [0.0]])
    dp = prob.space.eval_pressure(
        pf, np.array([(0.45, 0.2, 0.205), (0.55, 0.2, 0.205)]))
    dP = float(dp[0] - dp[1])
    print(f"cD = {float(cD):.5f}   (published 6.05 .. 6.25)")
    print(f"cL = {float(cL):.6f}  (published 0.008 .. 0.010)")
    print(f"dP = {dP:.5f}   (published 0.165 .. 0.175)")


if __name__ == "__main__":
    main()
