"""``solve_nse`` — the time-dependent orchestrator.

Facade over the scan integrators mirroring the reference's big
kwargs-driven driver (stokes_navier_utils.py:548-1599):

* initial value: steady Stokes solve (``start_ssstokes``,
  reference :836-911) or a provided ``iniv``,
* initial pressure via :func:`get_pfromv` (reference :921-940),
* semi-explicit dispatch to ``cnab``/``sbdf2`` (reference :1218-1221),
* trajectories returned in device/host memory instead of the
  reference's per-step ``.npy`` files (``dictofvelstrs``, :1057-1070).

The fully-implicit Newton-in-time path (reference :1304-1587) lives in
:mod:`.newton_ti`.
"""

import numpy as np

from .pfromv import get_pfromv
from .steady import solve_steadystate_nse
from . import timeint


def solve_nse(
    prob=None,
    trange=None,
    t0=None, tE=None, Nts=None,
    iniv=None, inip=None,
    start_ssstokes=False,
    stokes_flow=False,
    time_int_scheme="cnab",
    treat_nonl_explicit=True,
    lin_vel_point=None,
    f_tdp=None, g_tdp=None,
    dynamic_rhs=None, dynamic_rhs_memory=None,
    controls=None,
    check_ff_maxv=1e8,
    save_every=1,
    return_vp_dict=False,
    return_dictofvelstrs=False,
    data_prfx="data/traj",
    return_final_vp=True,
    vel_nwtn_stps=4, vel_nwtn_tol=1e-10, vel_pcrd_stps=2,
    paraviewoutput=False, vfileprfx="results/vel", prvoutpnts=None,
    verbose=False,
    **kw,
):
    """Solve the time-dependent incompressible NSE.

    Returns a dict with final ``(v, p)`` (inner dofs / physical pressure),
    the blow-up flag, and the decimated trajectory.
    """
    if trange is None:
        trange = np.linspace(t0, tE, Nts + 1)
    trange = np.asarray(trange)

    if iniv is None:
        if start_ssstokes:
            ncond = len(prob.invinds) + prob.np_cond
            import jax as _jax

            if ncond > 20000 and _jax.default_backend() != "cpu":
                # device LU runs out of VMEM beyond ~25k rows; the one-off
                # Stokes init goes through host SuperLU instead
                from .sadpnt import solve_sadpnt_host

                vp = solve_sadpnt_host(
                    amat=prob.Ac, jmat=prob.Jc, jmatT=prob.JTc,
                    rhsv=np.asarray(prob.fv).ravel(),
                    rhsp=np.asarray(prob.fp).ravel())
                iniv = vp[: len(prob.invinds), 0]
                inip = -vp[len(prob.invinds):, 0]
            else:
                vss, pss = solve_steadystate_nse(
                    prob, only_stokes=True, return_vp=True, verbose=verbose)
                iniv = vss.ravel()[prob.invinds]
                inip = pss.ravel()
        else:
            raise ValueError("provide `iniv` or set `start_ssstokes`")
    else:
        iniv = np.asarray(iniv).ravel()
        if len(iniv) == prob.nv_full:
            iniv = iniv[prob.invinds]
    if inip is None:
        inip = np.asarray(
            get_pfromv(v=iniv, prob=prob, stokes_flow=stokes_flow)
        ).ravel()

    if not treat_nonl_explicit or lin_vel_point is not None:
        from .newton_ti import solve_nse_newton_ti

        return solve_nse_newton_ti(
            prob=prob, trange=trange, iniv=iniv, inip=inip,
            lin_vel_point=lin_vel_point, stokes_flow=stokes_flow,
            vel_nwtn_stps=vel_nwtn_stps, vel_nwtn_tol=vel_nwtn_tol,
            vel_pcrd_stps=vel_pcrd_stps,
            controls=controls, save_every=save_every, verbose=verbose, **kw)

    scheme = {"cnab": timeint.cnab, "sbdf2": timeint.sbdf2}[time_int_scheme]
    out = scheme(
        trange=trange, prob=prob, inivel=iniv, inip=inip,
        stokes_flow=stokes_flow,
        f_tdp=f_tdp, g_tdp=g_tdp,
        dynamic_rhs=dynamic_rhs, dynamic_rhs_memory=dynamic_rhs_memory,
        controls=controls, check_ff_maxv=check_ff_maxv,
        save_every=save_every, verbose=verbose, **kw)
    out["iniv"], out["inip"] = iniv, inip
    if return_vp_dict and out["times"] is not None:
        out["vp_dict"] = {
            float(t): dict(v=np.asarray(out["vs"][i]),
                           p=np.asarray(out["ps"][i]))
            for i, t in enumerate(out["times"])
        }
    if return_dictofvelstrs and out["times"] is not None:
        # file-backed trajectory dict {t: path} — the reference's
        # mechanism for passing linearization points between runs
        # (stokes_navier_utils.py:1057-1070, return_dictofvelstrs)
        import os

        from ..utils.io import save_npa

        os.makedirs(os.path.dirname(data_prfx) or ".", exist_ok=True)
        dictofvelstrs = {}
        for i, t in enumerate(np.asarray(out["times"])):
            pth = f"{data_prfx}__vel_t{float(t):.6f}"
            save_npa(np.asarray(out["vs"][i]), pth)
            dictofvelstrs[float(t)] = pth + ".npy"
        out["dictofvelstrs"] = dictofvelstrs
    if paraviewoutput and out["times"] is not None:
        # decimated-trajectory Paraview series (the reference writes
        # inside the loop via dou.output_paraview; we write post-scan
        # from the device-resident trajectory)
        from ..utils.vtk import PVDWriter

        w = PVDWriter(vfileprfx, prob,
                      tfilter=prvoutpnts)
        for i, t in enumerate(np.asarray(out["times"])):
            w.write(v_full=np.asarray(prob.embed(out["vs"][i])),
                    p=np.asarray(out["ps"][i]), t=float(t))
        w.close()
        out["pvdfile"] = vfileprfx + ".pvd"
    return out
