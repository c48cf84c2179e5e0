"""Generic parameterized time-dependent NSE driver — the argparse twin
of the reference's benchmark entry (tests/time_dep_nse_generic.py:67-93
with its shell wrapper tests/start-generic-tdp-sim.sh): load a mesh by
prefix+level (dolfin XML + facet regions + JSON geometry descriptor),
CNAB-integrate from the Stokes steady state, optionally dump a Paraview
time series.

Example (the reference's recorded stable configuration):

    python examples/time_dep_nse_generic.py \
        --meshprefix /root/reference/tests/mesh/karman2D-outlets \
        --meshlevel 1 --Re 40 --Nts 4200 --tE 4 --paraviewframes 200
"""

import argparse
import os

import numpy as np

from dolfin_navier_scipy_tpu.models import get_sysmats
from dolfin_navier_scipy_tpu.solve import solve_nse


def testit(meshprfx="mesh/karman2D-outlets", meshlevel=1,
           proutdir="results/", Re=100, t0=0.0, tE=1.0, Nts=101,
           scheme="TH", paraviewoutput=False, prvoutpnts=200,
           scheme_ti="cnab"):
    meshfile = f"{meshprfx}_lvl{meshlevel}.xml.gz"
    physregs = f"{meshprfx}_lvl{meshlevel}_facet_region.xml.gz"
    geodata = f"{meshprfx}_geo_cntrlbc.json"
    for pth in (meshfile, physregs, geodata):
        if not os.path.exists(pth):
            raise FileNotFoundError(pth)

    femp, stokesmatsc, rhsd = get_sysmats(
        problem="gen_bccont", Re=Re, bccontrol=False, scheme=scheme,
        mergerhs=True,
        meshparams=dict(strtomeshfile=meshfile,
                        strtophysicalregions=physregs,
                        strtobcsobs=geodata))
    prob = femp["problem"]
    print(f"mesh {meshfile}: NV={prob.nv_full} NP={prob.np_cond} "
          f"Re={femp['Re']} nu={femp['nu']:.3e}")

    os.makedirs(proutdir, exist_ok=True)
    out = solve_nse(
        prob=prob, t0=t0, tE=tE, Nts=int(Nts),
        start_ssstokes=True, time_int_scheme=scheme_ti,
        save_every=max(1, int(Nts) // max(1, prvoutpnts)),
        paraviewoutput=paraviewoutput,
        vfileprfx=os.path.join(proutdir, "vel_"),
        verbose=True)
    vmax = float(np.abs(np.asarray(out["v"])).max())
    print(f"{'BLOW-UP' if out['ffflag'] else 'completed'}: "
          f"|v|max={vmax:.4e} at tE={tE}")
    if paraviewoutput:
        print("for plots check \nparaview " + out["pvdfile"])
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--meshprefix", type=str,
                        help="prefix for the mesh files",
                        default="/root/reference/tests/mesh/karman2D-outlets")
    parser.add_argument("--meshlevel", type=int,
                        help="mesh level", default=1)
    parser.add_argument("--Re", type=float,
                        help="Reynolds number", default=100)
    parser.add_argument("--tE", type=float,
                        help="final time of the simulation", default=5.0)
    parser.add_argument("--Nts", type=float,
                        help="number of time steps", default=8192)
    parser.add_argument("--scaletest", type=float,
                        help="scale the test size", default=1.0)
    parser.add_argument("--paraviewframes", type=int,
                        help="number of outputs for paraview", default=200)
    parser.add_argument("--scheme", type=str, default="TH",
                        choices=("TH", "CR"))
    parser.add_argument("--timeint", type=str, default="cnab",
                        choices=("cnab", "sbdf2"))
    parser.add_argument("--noparaview", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="smoke preset: a few steps, no paraview")
    args = parser.parse_args()
    print(args)

    if args.tiny:
        testit(meshprfx=args.meshprefix, meshlevel=1, Re=60, t0=0.0,
               tE=0.01, Nts=8, scheme=args.scheme,
               scheme_ti=args.timeint, paraviewoutput=False)
    else:
        testit(meshprfx=args.meshprefix, meshlevel=args.meshlevel,
               Re=args.Re, t0=0.0, tE=args.scaletest * args.tE,
               Nts=int(args.scaletest * args.Nts), scheme=args.scheme,
               scheme_ti=args.timeint,
               paraviewoutput=not args.noparaview,
               prvoutpnts=args.paraviewframes)
