"""Time-dependent NSE with iterative per-step saddle solves — twin of
the reference's tests/time_dep_nse_krylov.py: ``krylov='gmres'`` routes
every time-step solve through the matrix-free preconditioned-GMRES
saddle solver instead of a reused factorization."""

import argparse

import numpy as np

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import solve_nse


def testit(N=10, nu=1e-2, Nts=200, tE=0.2):
    prob = drivencavity_problem(N=N, nu=nu)
    out = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=Nts,
                    start_ssstokes=True,
                    krylov="gmres", krpslvprms=dict(tol=1e-9),
                    save_every=Nts // 4)
    v = np.asarray(out["v"])
    print(f"ffflag={out['ffflag']}  |v|={np.linalg.norm(v):.6f}")

    # cross-check against the direct (block-Schur) path
    ref = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=Nts,
                    start_ssstokes=True, save_every=None)
    rel = (np.linalg.norm(v - np.asarray(ref["v"]))
           / np.linalg.norm(np.asarray(ref["v"])))
    print(f"krylov-vs-direct relative difference: {rel:.2e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=10)
    ap.add_argument("--Nts", type=int, default=200)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: small cavity, a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(N=8, Nts=10, tE=0.01)
    else:
        testit(N=args.N, Nts=args.Nts)
