"""Unsteady double-rotating-cylinder flow with Robin-penalized rotation
control — twin of the reference's tests/time_dep_nse_double_rotcyl_bcrob.py,
run on the reference's own bundled meshes and control geometry
(2D-double-rotcyl_geo_cntrlbc_rotcntrl.json):
``A += 1/palpha Arob`` and a sinusoidal control signal through
``B = 1/palpha Brob`` on both cylinder surfaces."""

import argparse
import os

import numpy as np

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.control import apply_robin_penalty
from dolfin_navier_scipy_tpu.models import get_sysmats
from dolfin_navier_scipy_tpu.solve import solve_nse

REFMESH = os.environ.get("DNS_TPU_REFMESH", "/root/reference/tests/mesh")


def testit(meshlvl=1, Re=60, tE=1.0, Nts=400, palpha=1e-5,
           zerocontrol=False, paraviewoutput=False):
    femp, stokesmatsc, rhsd = get_sysmats(
        problem="gen_bccont", Re=Re, scheme="TH", mergerhs=True,
        bccontrol=True,
        meshparams=dict(
            strtomeshfile=f"{REFMESH}/2D-double-rotcyl_lvl{meshlvl}.xml.gz",
            movingwallcntrl=False,
            strtophysicalregions=(
                f"{REFMESH}/2D-double-rotcyl_lvl{meshlvl}"
                "_facet_region.xml.gz"),
            strtobcsobs=(
                f"{REFMESH}/2D-double-rotcyl_geo_cntrlbc_rotcntrl.json")))
    prob = femp["problem"]
    Brob = apply_robin_penalty(prob, palpha=palpha)
    if zerocontrol:
        Brob = 0.0 * Brob

    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    bsum = jnp.asarray(np.asarray(Brob[:, 0] + Brob[:, 1]).ravel())

    out = solve_nse(
        prob=prob, t0=0.0, tE=tE, Nts=Nts, start_ssstokes=True,
        f_tdp=lambda t: fv + jnp.sin(t / tE * 2 * np.pi) * bsum,
        paraviewoutput=paraviewoutput,
        vfileprfx="results/vel_doublerotcyl",
        save_every=max(Nts // 8, 1))
    print(f"blow-up flag: {out['ffflag']}")
    for i, t in enumerate(np.asarray(out["times"])):
        vn = np.linalg.norm(np.asarray(out["vs"][i]))
        print(f"t={t:7.4f}  |v|={vn:.6f}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=60)
    ap.add_argument("--tE", type=float, default=1.0)
    ap.add_argument("--Nts", type=int, default=400)
    ap.add_argument("--zerocontrol", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: a few steps")
    args = ap.parse_args()
    if args.tiny:
        testit(meshlvl=1, Re=40, tE=0.02, Nts=8,
               zerocontrol=args.zerocontrol)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re, tE=args.tE,
               Nts=args.Nts, zerocontrol=args.zerocontrol)
