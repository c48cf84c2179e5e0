"""Steady state on the double-rotating-cylinder geometry — twin of the
reference's tests/steadystate_double_rotcyl.py, run on the reference's
own bundled meshes (2D-double-rotcyl_lvl*.xml.gz + geometry JSON)."""

import argparse
import os

import numpy as np

from dolfin_navier_scipy_tpu.models import get_sysmats
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse

REFMESH = os.environ.get("DNS_TPU_REFMESH", "/root/reference/tests/mesh")


def testit(meshlvl=1, nu=None, Re=40, charvel=1.0, scheme="TH"):
    meshfile = f"{REFMESH}/2D-double-rotcyl_lvl{meshlvl}.xml.gz"
    physregs = f"{REFMESH}/2D-double-rotcyl_lvl{meshlvl}_facet_region.xml.gz"
    geodata = f"{REFMESH}/2D-double-rotcyl_geo_cntrlbc.json"

    femp, stokesmatsc, rhsd = get_sysmats(
        problem="gen_bccont", nu=nu, Re=Re, charvel=charvel, scheme=scheme,
        mergerhs=True,
        meshparams=dict(strtomeshfile=meshfile, movingwallcntrl=False,
                        strtophysicalregions=physregs,
                        strtobcsobs=geodata))
    prob = femp["problem"]
    NP, NV = stokesmatsc["J"].shape
    print("NV + NP : {0} + {1} = {2}".format(NV, NP, NV + NP))

    (v, p), norms = solve_steadystate_nse(
        prob, return_vp=True, verbose=True, vel_pcrd_stps=15,
        vel_nwtn_tol=5e-13, linsolver="host-sparse",
        return_nwtnupd_norms=True)
    v = np.asarray(v).ravel()
    print(f"steady state: |v| = {np.linalg.norm(v):.6f}, "
          f"{len(norms)} sweeps, last update {norms[-1]:.2e}")
    return v, np.asarray(p).ravel(), prob


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshlvl", type=int, default=1)
    ap.add_argument("--Re", type=float, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the host-sparse steady "
                         "path pays per-op remote compiles on the TPU "
                         "tunnel otherwise)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke preset: lvl1 mesh, low Re")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        testit(meshlvl=1, Re=20)
    else:
        testit(meshlvl=args.meshlvl, Re=args.Re or 40)
