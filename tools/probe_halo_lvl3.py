"""Time the full halo CNAB scan at lvl3 on the real chip and derive
its per-step collective volume (VERDICT r3 weak #5: the halo path had
never been timed on hardware or at scale).

``shard_map`` over a 1-device mesh is legal — the ppermutes become
self-copies, so the measurement is the halo path's COMPUTE cost per
step (its collective volume is computed analytically below and is
negligible next to ICI bandwidth).  Compare against the banded
single-chip scan (bench.py level3) for the crossover analysis: the
halo path trades ~2 orders more operator applications per step for
O(n/ndev) memory per device — its regime is capacity (no-HBM-ceiling)
and weak scaling, not single-chip speed.

Run: ``python tools/probe_halo_lvl3.py [--level 3] [--nsteps 40]``
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--nsteps", type=int, default=40)
    ap.add_argument("--nf", type=int, default=30)
    ap.add_argument("--ns", type=int, default=12)
    ap.add_argument("--nlp", type=int, default=25)
    ap.add_argument("--ndev", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.parallel.halo import (
        halo_cnab_scan, make_halo_cnab_step,
    )
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    t0 = time.time()
    prob = cylinderwake_problem(level=args.level, nu=1e-3, charvel=1.0)
    dt = 6.25e-5 if args.level >= 3 else 2.5e-4
    nin = len(prob.invinds)
    print(f"[{time.time() - t0:6.1f}s] lvl{args.level}: "
          f"{nin + prob.np_cond} dofs", flush=True)

    vp = solve_sadpnt_host(amat=prob.Mc + 0.5 * dt * prob.Ac,
                           jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    v0 = vp[:nin, 0]
    ndev = args.ndev or len(jax.devices())
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("elem",))
    with mesh:
        halo, hconv, bundle = make_halo_cnab_step(prob, dt, mesh,
                                                  theta=0.5)
        print(f"[{time.time() - t0:6.1f}s] halo built: ndev={ndev} "
              f"nb={halo.nb} h={halo.h} hp={halo.hp} "
              f"banded_tail={hconv.b_leaves is not None}", flush=True)
        v0p = halo.to_perm(jnp.asarray(v0))

        def run(n):
            return halo.from_perm(halo_cnab_scan(
                halo, hconv, bundle, v0p, n, dt, theta=0.5,
                niter_f=args.nf, niter_s=args.ns, niter_lp=args.nlp))

        jax.block_until_ready(run(args.nsteps))      # compile + warm
        els = []
        vals = []
        for k in (1, 2, 3):
            v0p = halo.to_perm(jnp.asarray(v0 * (1 + k * 1e-13)))
            t1 = time.perf_counter()
            v = run(args.nsteps)
            v.block_until_ready()
            els.append(time.perf_counter() - t1)
            vals.append(np.asarray(v))
    assert not np.array_equal(vals[0], vals[1]), "result cache!"
    el = float(np.median(els))
    sps = args.nsteps / el
    assert np.isfinite(vals[-1]).all()

    # analytic per-step collective volume (per device boundary): each
    # operator application = 4 ppermutes of the halo width (f64); the
    # mf Schur solve does ~(2 nf + ns nlp) F-applications and ~2 ns
    # J/J^T applications; PCG dots are scalar psums (negligible)
    f_apps = 2 * args.nf + args.ns * args.nlp + 3
    j_apps = 2 * args.ns + 3
    coll = (f_apps * 4 * halo.h + j_apps * 2 * (halo.h + halo.hp)) * 8
    print(f"halo lvl{args.level} x{ndev}dev: {sps:.1f} steps/s "
          f"({el / args.nsteps * 1e3:.1f} ms/step)")
    print(f"  ~{f_apps} F-apps + {j_apps} J-apps per step; collective "
          f"volume ~{coll / 1e6:.2f} MB/step/boundary "
          f"(~{coll * sps / 1e9:.3f} GB/s per ICI link)")


if __name__ == "__main__":
    main()
