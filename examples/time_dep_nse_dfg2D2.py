"""DFG 2D-2 benchmark: unsteady cylinder wake at Re=100 (vortex shedding).

The Schaefer-Turek 2D-2 configuration (featflow.de; the reference's
meshes/drivers target the same channel): parabolic inflow with mean
velocity U=1.0 (peak 1.5), nu=1e-3, cylinder D=0.1 => Re=100.  The flow
sheds a periodic Karman street; the benchmark quantities are

    cDmax in [3.2200, 3.2400]
    cLmax in [0.9900, 1.0100]
    St    in [0.2950, 0.3050]
    DeltaP(t0 + 1/(2f)) in [2.4600, 2.5000]   (t0 = time of cLmax)

The reference framework integrates this configuration for *throughput*
(tests/time_dep_nse_generic.py) but never evaluates the unsteady
coefficients — its per-step observables reuse the steady evaluator
without the M dv/dt term (tests/tdp_2D_simu.py:68-130).  Here the
coefficients are emitted every step INSIDE the scan by the
consistent-flux functional (models/functionals.make_inscan_liftdrag),
so the full benchmark run is one device scan.

Usage (TPU, level 2, ~1-3 min):
    python examples/time_dep_nse_dfg2D2.py --level 2 --dt 2e-4 --tE 7
"""

import argparse
import json

import numpy as np


# published featflow intervals (Schaefer & Turek 1996, 2D-2)
INTERVALS = {
    "cdmax": (3.2200, 3.2400),
    "clmax": (0.9900, 1.0100),
    "St": (0.2950, 0.3050),
    "dp_half": (2.4600, 2.5000),
}


def analyze_shedding(t, cl, cd, dp, measure_last=2.0):
    """Strouhal / extrema over the trailing ``measure_last`` seconds."""
    t = np.asarray(t)
    sel = t >= t[-1] - measure_last
    tw, clw, cdw, dpw = t[sel], cl[sel], cd[sel], dp[sel]
    base = clw - clw.mean()
    rising = np.flatnonzero((base[:-1] < 0) & (base[1:] >= 0))
    out = dict(n_periods=max(0, len(rising) - 1))
    if len(rising) < 2:
        out.update(St=float("nan"), cdmax=float(cdw.max()),
                   clmax=float(clw.max()), dp_half=float("nan"))
        return out
    # linear-interpolated crossing times
    tc = []
    for i in rising:
        f0, f1 = base[i], base[i + 1]
        tc.append(tw[i] + (tw[i + 1] - tw[i]) * (-f0) / (f1 - f0))
    period = float(np.diff(tc).mean())
    out["St"] = 0.1 / period                    # f L / U with L=0.1, U=1
    # extrema over the last FULL period
    psel = tw >= tc[-1] - period
    out["cdmax"] = float(cdw[psel].max())
    out["clmax"] = float(clw[psel].max())
    # DeltaP at t0 + T/2, t0 = last cl maximum with a half period after
    ipk = np.flatnonzero(psel)[np.argmax(clw[psel])]
    t_half = tw[ipk] + 0.5 * period
    if t_half <= tw[-1]:
        out["dp_half"] = float(np.interp(t_half, tw, dpw))
    else:
        ipk2 = np.flatnonzero(tw >= tc[-2] - period)
        ipk2 = ipk2[np.argmax(clw[ipk2])]
        out["dp_half"] = float(np.interp(tw[ipk2] + 0.5 * period, tw, dpw))
    out["period"] = period
    return out


def run_dfg2d2(level=2, dt=2e-4, tE=7.0, measure_last=2.0, perturb=0.1,
               scheme="cnab", verbose=True):
    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.models.functionals import (
        make_inscan_liftdrag,
    )
    from dolfin_navier_scipy_tpu.solve import solve_nse
    from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host

    prob = cylinderwake_problem(level=level, nu=1e-3, charvel=1.0)
    nin = len(prob.invinds)
    if verbose:
        print(f"level {level}: {nin + prob.np_cond} dofs, Re={prob.Re}")

    # Stokes initial value (host splu: one-off, any size)
    vp = solve_sadpnt_host(amat=prob.Ac, jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=np.asarray(prob.fv).ravel(),
                           rhsp=np.asarray(prob.fp).ravel())
    iniv = vp[:nin, 0]

    # asymmetric kick behind the cylinder to trigger shedding promptly
    xy = prob.space.p2_coords
    blob = np.exp(-(((xy[:, 0] - 0.3) / 0.08) ** 2
                    + ((xy[:, 1] - 0.22) / 0.06) ** 2))
    kick = np.zeros(prob.nv_full)
    kick[1::2] = blob
    kick[prob.bcinds] = 0.0
    iniv = iniv + perturb * kick[prob.invinds]

    nts = int(round(tE / dt))
    outfunc, ob = make_inscan_liftdrag(prob, dt, charvel=1.0)
    out = solve_nse(prob=prob, t0=0.0, tE=tE, Nts=nts, iniv=iniv,
                    time_int_scheme=scheme, save_every=None,
                    outfunc=outfunc, out_bundle=ob, verbose=verbose)
    if out["ffflag"]:
        raise RuntimeError("blow-up flag set — reduce dt")
    outs = np.asarray(out["outs"], dtype=np.float64)
    t = np.asarray(out["out_times"])
    res = analyze_shedding(t, outs[:, 0], outs[:, 1], outs[:, 2],
                           measure_last=measure_last)
    res["level"] = level
    res["dt"] = dt
    res["tE"] = tE
    res["dofs"] = nin + prob.np_cond
    res["series"] = dict(t=t.tolist()[:: max(1, len(t) // 2000)],
                         cl=outs[:, 0].tolist()[:: max(1, len(t) // 2000)],
                         cd=outs[:, 1].tolist()[:: max(1, len(t) // 2000)],
                         dp=outs[:, 2].tolist()[:: max(1, len(t) // 2000)])
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--dt", type=float, default=2e-4)
    ap.add_argument("--tE", type=float, default=7.0)
    ap.add_argument("--measure", type=float, default=2.0)
    ap.add_argument("--perturb", type=float, default=0.1)
    ap.add_argument("--scheme", default="cnab", choices=["cnab", "sbdf2"])
    ap.add_argument("--json", default=None, help="write results to file")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: coarsest mesh, a few steps "
                         "(benchmark values are NOT reached)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.tiny:
        args.level, args.dt, args.tE, args.measure = 0, 1e-3, 0.01, 0.01
    res = run_dfg2d2(level=args.level, dt=args.dt, tE=args.tE,
                     measure_last=args.measure, perturb=args.perturb,
                     scheme=args.scheme)
    series = res.pop("series")
    print(json.dumps(res, indent=2))
    for key, (lo, hi) in INTERVALS.items():
        val = res.get(key, float("nan"))
        ok = "OK " if lo <= val <= hi else "OUT"
        print(f"  {ok} {key:8s} = {val:.4f}   published [{lo}, {hi}]")
    if args.json:
        res["series"] = series
        with open(args.json, "w") as f:
            json.dump(res, f)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
