"""Adjoint (gradient-through-the-solver) inversion on the cylinder wake.

Recovers an UNKNOWN per-step forcing schedule from one terminal
observation of the velocity field, by gradient descent with the EXACT
discrete adjoint that ``jax.grad`` derives through the CNAB scan
(`solve/adjoint.py`) — the classic data-assimilation / inverse-problem
loop with the flow solver as a differentiable layer.

The reference framework has no adjoint path at all — its loops are
forward-only scipy/dolfin recipes (stokes_navier_utils.py) — so this
driver demonstrates a capability class beyond the reference's surface:
PDE-constrained optimization without hand-deriving an adjoint PDE.

Usage:
    python examples/adjoint_control_gradient.py [--steps 40] [--iters 30]
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40,
                    help="horizon length (CNAB steps)")
    ap.add_argument("--iters", type=int, default=30,
                    help="gradient-descent iterations")
    ap.add_argument("--dt", type=float, default=2.5e-4)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: 4 steps, 2 iterations")
    args = ap.parse_args()
    if args.tiny:
        args.steps, args.iters = 4, 2

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.solve import (
        make_diff_cnab, solve_steadystate_nse,
    )

    prob = cylinderwake_problem(level=args.level, Re=40, charvel=0.2)
    v0 = np.asarray(
        solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-11)
    ).ravel()[prob.invinds]

    # actuation: a smooth vertical body-force pattern behind the cylinder
    xy = prob.space.p2_coords                      # (nv_full/2, 2)
    blob = np.exp(-(((xy[:, 0] - 0.3) / 0.08) ** 2
                    + ((xy[:, 1] - 0.2) / 0.08) ** 2))
    b = np.zeros(prob.nv_full)
    b[1::2] = blob                 # y-component (interleaved dof layout)
    b[prob.bcinds] = 0.0

    sim = make_diff_cnab(prob, args.dt, bvec=b)

    # ground truth: a smooth pulse schedule, observed only through the
    # terminal velocity field
    n = args.steps
    t = np.linspace(0, 1, n)
    # amplitude calibrated so the forcing deflects the terminal state
    # by ~6% of |v| (the raw dof-pattern direction is not mass-scaled)
    amps_true = jnp.asarray(1e-3 * np.sin(np.pi * t) ** 2)
    v_obs = sim(jnp.asarray(v0), amps_true)

    def cost(amps):
        dv = sim(jnp.asarray(v0), amps) - v_obs
        return 0.5 * jnp.sum(dv ** 2)

    vg = jax.jit(jax.value_and_grad(cost))
    amps = jnp.zeros(n)
    c, g = vg(amps)
    c0 = float(c)
    print(f"initial misfit (zero schedule): {c0:.6e}")
    # gradient descent with Armijo backtracking
    lr = float(c) / float(jnp.vdot(g, g))
    c = c0
    for k in range(args.iters):
        while lr > 1e-24:
            trial = amps - lr * g
            ct = float(cost(trial))
            if np.isfinite(ct) and ct < c:
                amps, c = trial, ct
                lr *= 1.5
                break
            lr *= 0.5
        _, g = vg(amps)
        if k % 5 == 0 or k == args.iters - 1:
            err = float(jnp.linalg.norm(amps - amps_true)
                        / jnp.linalg.norm(amps_true))
            print(f"iter {k:3d}: misfit {c:.6e} ({c / c0:.2e}x)  "
                  f"schedule rel err {err:.3f}")
    err = float(jnp.linalg.norm(amps - amps_true)
                / jnp.linalg.norm(amps_true))
    print(f"recovered forcing schedule: rel err {err:.4f} "
          f"(misfit reduced {c / c0:.2e}x)")


if __name__ == "__main__":
    main()
