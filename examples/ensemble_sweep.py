"""Batched parameter sweep: B perturbed trajectories in ONE scan.

The reference's sweep workflow launches one process per parameter value
(tests/start-generic-tdp-sim.sh + tests/time_dep_nse_generic.py) — a
serial CPU recipe.  The TPU-native form vmaps the production banded
w-space CNAB step over the ensemble axis
(parallel/ensemble.make_ensemble_wspace_scan): every per-member banded
application becomes one batched MXU matmul that reads the operator
tables from HBM once for ALL members, so aggregate trajectory-steps/s
scales nearly with B until the MXU saturates.

This driver sweeps initial-condition perturbation amplitudes on the
cylinder wake (the classic ensemble/UQ use: sensitivity of the wake
transient to state uncertainty) and prints per-member divergence from
the unperturbed trajectory plus the aggregate throughput.
"""

import argparse
import time

import numpy as np


def run_sweep(meshlvl=1, Re=40, charvel=0.2, tE=0.5, Nts=500, B=16,
              eps_max=1e-2, seed=0):
    import jax

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.parallel.ensemble import (
        make_ensemble_wspace_scan,
    )
    from dolfin_navier_scipy_tpu.solve import solve_nse

    prob = cylinderwake_problem(level=meshlvl, Re=Re, charvel=charvel)
    dt = tE / Nts
    # common base state: one Stokes-started step (as solve_nse does)
    v0 = np.asarray(solve_nse(prob=prob, t0=0.0, tE=dt, Nts=1,
                              start_ssstokes=True,
                              save_every=None)["iniv"]).ravel()

    rng = np.random.default_rng(seed)
    amps = np.linspace(0.0, eps_max, B)
    pert = rng.standard_normal(len(v0))
    pert /= np.linalg.norm(pert)
    V0 = np.stack([v0 + a * np.linalg.norm(v0) * pert for a in amps])

    run, place = make_ensemble_wspace_scan(prob, dt, refine=1)
    VB = place(V0)
    jax.block_until_ready(run(VB, 2))            # compile once
    t0 = time.perf_counter()
    V = np.asarray(run(VB, Nts))
    el = time.perf_counter() - t0
    print(f"{B} members x {Nts} steps in {el:.2f} s = "
          f"{B * Nts / el:.1f} aggregate traj-steps/s")
    ref = V[0]
    for k, a in enumerate(amps):
        d = np.linalg.norm(V[k] - ref) / np.linalg.norm(ref)
        print(f"member {k:3d}: eps={a:.2e}  |v(tE)|={np.linalg.norm(V[k]):.6f}"
              f"  rel dev from unperturbed {d:.3e}")
    return V


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=40)
    ap.add_argument("--tE", type=float, default=0.5)
    ap.add_argument("--Nts", type=int, default=500)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--eps", type=float, default=1e-2)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: 4 members, a few steps")
    args = ap.parse_args()
    if args.tiny:
        run_sweep(meshlvl=0, Re=40, tE=0.01, Nts=10, B=4)
    else:
        run_sweep(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
                  Nts=args.Nts, B=args.B, eps_max=args.eps)
