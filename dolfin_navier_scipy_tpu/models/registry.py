"""``get_sysmats`` facade — API parity with the reference's problem
registry (problem_setups.py:34-220).

Returns ``(femp, stokesmatsc, rhsd)`` dictionaries with the reference's
key names so that driver scripts written against the reference port
mechanically; the compiled :class:`NSEProblem` rides along under
``femp['problem']``.
"""

import numpy as np

from .cylinderwake import cylinderwake_problem
from .drivencavity import drivencavity_problem


def get_sysmats(problem="gen_bccont", scheme="TH", ppin=None, Re=None,
                nu=None, charvel=1.0, gradvsymmtrc=True, bccontrol=False,
                mergerhs=True, meshparams=None, **kw):
    meshparams = dict(meshparams or {})
    if problem == "drivencavity":
        prob = drivencavity_problem(
            N=meshparams.get("N", 10), nu=nu, Re=Re, scheme=scheme,
            gradvsymmtrc=gradvsymmtrc,
        )
    elif problem == "cylinderwake3D":
        from .cylinderwake3d import cylinderwake3d_problem

        prob = cylinderwake3d_problem(
            level=meshparams.get("level", 0),
            nz=meshparams.get("nz", 3),
            nu=nu, Re=Re, charvel=charvel,
        )
    elif problem in ("cylinderwake", "gen_bccont", "cylinder_rot"):
        mesh = meshparams.get("mesh")
        geodata = meshparams.get("geodata")
        if meshparams.get("strtomeshfile"):
            # the reference's file-based meshparams
            # (problem_setups.py:774-830): dolfin XML mesh + facet-region
            # MeshFunction + JSON geometry descriptor
            from ..mesh.dolfinxml import read_dolfin_xml, read_facet_region

            mesh = read_dolfin_xml(meshparams["strtomeshfile"])
            if meshparams.get("strtophysicalregions"):
                read_facet_region(mesh, meshparams["strtophysicalregions"])
            geodata = geodata or meshparams.get("strtobcsobs")
        prob = cylinderwake_problem(
            level=meshparams.get("level", 1),
            mesh=mesh,
            geodata=geodata,
            nu=nu, Re=Re, charvel=charvel, scheme=scheme,
            gradvsymmtrc=gradvsymmtrc,
            bccontrol=bccontrol,
            movingwallcntrl=kw.get("movingwallcntrl",
                                   problem == "cylinder_rot"),
            rotcntrl_omega=kw.get("rotcntrl_omega", 0.0),
        )
    else:
        raise KeyError(f"unknown problem class {problem}")

    femp = dict(
        problem=prob,
        invinds=prob.invinds,
        dbcinds=[prob.bcinds],
        dbcvals=[prob.bcvals],
        nu=prob.nu,
        Re=prob.Re,
        charlen=prob.geo.charlen,
        ppin=prob.geo.ppin,
        odcoo=prob.geo.odcoo,
        ldsbcinds=prob.ldsbcinds,
        V=prob.space,
        Q=None,
        mesh=prob.space.mesh,
    )
    stokesmatsc = dict(
        M=prob.Mc, A=prob.Ac, J=prob.Jc, JT=prob.JTc, MP=prob.MP,
        Jfull=prob.full["J"],
    )
    if prob.Arob is not None:
        stokesmatsc.update(Arob=prob.Arob, Brob=prob.Brob)
    if mergerhs:
        rhsd = dict(fv=np.asarray(prob.fv).reshape(-1, 1),
                    fp=np.asarray(prob.fp).reshape(-1, 1))
        return femp, stokesmatsc, rhsd
    # split bookkeeping (reference returns rhsd_vfrc + rhsd_stbc):
    # body-force part vs Dirichlet-fold part
    fv_body = np.asarray(prob.fv_body_full).ravel()[prob.invinds]
    fp_body = np.asarray(prob.fp_body_full).ravel()[: prob.np_cond]
    rhsd_vfrc = dict(fvc=fv_body.reshape(-1, 1),
                     fpr=fp_body.reshape(-1, 1))
    rhsd_stbc = dict(
        fv=(np.asarray(prob.fv).ravel() - fv_body).reshape(-1, 1),
        fp=(np.asarray(prob.fp).ravel() - fp_body).reshape(-1, 1))
    return femp, stokesmatsc, rhsd_vfrc, rhsd_stbc
