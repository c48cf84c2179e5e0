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

import glob
import os

import numpy as np

from .pfromv import get_pfromv
from .steady import solve_steadystate_nse
from . import timeint


def _carry_to_host(carry):
    """Scan carry -> a single pickled-pytree npz payload.

    The carry of a controlled run nests control memories (``cmems``),
    dynamic-rhs memory (``drm``) and the boundary values (``cvals``) —
    all jax-traceable pytrees (they live in the scan carry), so array
    leaves round-trip bit-exactly through numpy+pickle.  This is what
    lets ``save_data`` cover closed-loop runs, matching the reference's
    cache which stores every controlled trajectory too
    (stokes_navier_utils.py:950-1070)."""
    import pickle

    import jax

    def _host(v):
        return np.asarray(v) if hasattr(v, "dtype") else v

    host = jax.tree_util.tree_map(_host, carry)
    return {"carry_pkl": np.frombuffer(pickle.dumps(host), dtype=np.uint8)}


_CARRY_DEFAULTS = dict(drm=None, cvals=None, cmems=(), bfv=0.0,
                       mbc=0.0, mbc_p=0.0)


def _carry_from_npz(path, scheme):
    """Rebuild a scan carry from an ``.npz`` checkpoint.  Current files
    hold one pickled pytree (controlled + uncontrolled); the legacy
    plain-array layout of earlier checkpoints still loads."""
    dat = np.load(path)
    if "carry_pkl" in dat.files:
        import pickle

        return pickle.loads(dat["carry_pkl"].tobytes())
    keys = (("v", "p", "nfc", "fv", "dfv", "gp", "flag")
            if scheme == "cnab"
            else ("v", "dv", "p", "nfc_p", "fv", "dfv", "gp", "flag"))
    carry = {k: dat[k] for k in keys}
    defaults = ("drm", "cvals", "cmems", "bfv", "mbc") if scheme == "cnab" \
        else ("drm", "cvals", "cmems", "mbc", "mbc_p")
    for k in defaults:
        carry[k] = _CARRY_DEFAULTS[k]
    return carry


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
    closed_loop=False, dynamic_feedback=False, dyn_fb_dict=None,
    dyn_fb_disc="AB2", static_feedback=False, feedbackthroughdict=None,
    b_mat=None, cv_mat=None, umat=None, vmat=None,
    check_ff_maxv=1e8,
    save_every=1,
    return_vp_dict=False,
    return_dictofvelstrs=False,
    data_prfx="data/traj",
    save_data=False, useolddata=False, clearprvdata=False,
    checkpoint_every=None,
    return_final_vp=True,
    vel_nwtn_stps=4, vel_nwtn_tol=1e-10, vel_pcrd_stps=2,
    paraviewoutput=False, vfileprfx="results/vel", prvoutpnts=None,
    krylov=None, krpslvprms=None,
    linsolver="auto", state_layout="auto",
    verbose=False,
    **kw,
):
    """Solve the time-dependent incompressible NSE.

    Key kwargs beyond the reference's (stokes_navier_utils.py:548-741):

    * ``closed_loop`` + ``dynamic_feedback``/``dyn_fb_dict``/
      ``dyn_fb_disc`` ('AB2' | 'trapezoidal' | 'linear_implicit') or
      ``static_feedback``/``feedbackthroughdict`` — LTI observer or
      low-rank state feedback (reference :1224-1263, :1367-1384);
      ``umat``/``vmat`` for direct static feedback.
    * ``save_data``/``useolddata``/``clearprvdata``/``checkpoint_every``
      — ``get_datastr``-keyed scan-carry checkpoints with EXACT resume.
    * ``linsolver`` ('auto' | 'dense' | 'schur' | 'krylov') and
      ``krylov``/``krpslvprms`` (reference kwargs) — per-step saddle
      solver choice.
    * ``state_layout`` ('auto' | 'full' | 'inner') — the full-dof fast
      layout for plain runs (see timeint.build_full_layout).
    * ``precision`` ('accurate' | 'fast') — f64 vs f32 trajectory carry;
      both run f32 device kernels via the increment formulation.

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

    fv_extra = None
    if closed_loop:
        # closed-loop feedback wiring (reference
        # stokes_navier_utils.py:1224-1263 dynamic, :1367-1384 static)
        def _dense(m):
            return np.asarray(m.todense() if hasattr(m, "todense") else m)

        if dynamic_feedback:
            if not treat_nonl_explicit:
                raise NotImplementedError(
                    "dynamic feedback rides the semi-explicit integrators "
                    "(as in the reference, stokes_navier_utils.py:1218-1263)")
            dfb = dict(dyn_fb_dict)
            b_ = _dense(b_mat)
            cv_ = _dense(cv_mat)
            if dyn_fb_disc == "linear_implicit":
                # monolithic augmentation: integrate the extended
                # (flow + controller) system (time_int_utils.py:492-563)
                from ..control.augment import nse_include_lnrcntrllr

                if f_tdp is not None or controls:
                    raise NotImplementedError(
                        "linear_implicit feedback with extra forcing")
                ext = nse_include_lnrcntrllr(
                    prob=prob, hA=dfb["ha"], hB=dfb["hb"], hC=dfb["hc"],
                    B=b_, C=cv_, hM=dfb.get("hm"),
                    hiniv=dfb.get("inihx"), hf_tdp=dfb.get("drift"))
                nin = len(prob.invinds)
                scheme = {"cnab": timeint.cnab,
                          "sbdf2": timeint.sbdf2}[time_int_scheme]
                eout = scheme(
                    trange=trange, prob=ext,
                    inivel=ext.extend_state(iniv),
                    inip=inip, check_ff_maxv=check_ff_maxv,
                    save_every=save_every, verbose=verbose, **kw)
                eout["hx"] = np.asarray(eout["v"])[nin:]
                eout["v"] = np.asarray(eout["v"])[:nin]
                if eout["vs"] is not None:
                    eout["hxs"] = np.asarray(eout["vs"])[:, nin:]
                    eout["vs"] = np.asarray(eout["vs"])[:, :nin]
                eout["iniv"], eout["inip"] = iniv, inip
                return eout
            from ..control.lti import get_heunab_lti, get_heuntrpz_lti

            if dyn_fb_disc == "trapezoidal":
                fbk, mem0 = get_heuntrpz_lti(
                    hb=dfb["hb"], ha=dfb["ha"], hc=dfb["hc"],
                    inihx=dfb["inihx"], drift=dfb.get("drift"),
                    constdt=float(trange[1] - trange[0]))
            elif dyn_fb_disc == "AB2":
                fbk, mem0 = get_heunab_lti(
                    hb=dfb["hb"], ha=dfb["ha"], hc=dfb["hc"],
                    inihx=dfb["inihx"], drift=dfb.get("drift"))
            else:
                raise ValueError(dyn_fb_disc)
            import jax.numpy as jnp

            b_j, cv_j = jnp.asarray(b_), jnp.asarray(cv_)

            def dynamic_rhs(t, vc=None, memory=None, mode=None):
                u, memory = fbk(t, vc=cv_j @ vc, memory=memory, mode=mode)
                return b_j @ u, memory

            dynamic_rhs_memory = mem0
        elif static_feedback or feedbackthroughdict is not None:
            # time-constant low-rank feedback: A -> A - b_mat @ mtxtb.T,
            # rhs += b_mat (b_mat.T w)  (reference :1367-1384)
            from ..utils.io import load_npa

            fbd = feedbackthroughdict[None]
            mtxtb = fbd["mtxtb"]
            w = fbd["w"]
            mtxtb = load_npa(mtxtb) if isinstance(mtxtb, str) else mtxtb
            w = load_npa(w) if isinstance(w, str) else w
            b_ = _dense(b_mat)
            umat = b_
            vmat = np.asarray(_dense(mtxtb)).T
            fv_fb = (b_ @ (b_.T @ np.asarray(w))).ravel()
            import jax.numpy as jnp

            fv_fb_j = jnp.asarray(fv_fb)
            fv_extra = fv_fb
            prev_f_tdp = f_tdp
            if prev_f_tdp is None:
                fv0 = jnp.asarray(np.asarray(prob.fv).ravel())
                f_tdp = lambda t: fv0 + fv_fb_j           # noqa: E731
            else:
                f_tdp = lambda t: prev_f_tdp(t) + fv_fb_j  # noqa: E731

    if not treat_nonl_explicit or lin_vel_point is not None:
        from .newton_ti import solve_nse_newton_ti

        return solve_nse_newton_ti(
            prob=prob, trange=trange, iniv=iniv, inip=inip,
            lin_vel_point=lin_vel_point, stokes_flow=stokes_flow,
            vel_nwtn_stps=vel_nwtn_stps, vel_nwtn_tol=vel_nwtn_tol,
            vel_pcrd_stps=vel_pcrd_stps, umat=umat, vmat=vmat,
            fv_extra=fv_extra, linsolver=linsolver,
            controls=controls, save_every=save_every, verbose=verbose, **kw)

    if krylov:
        # reference kwarg parity (solve_nse docstring
        # stokes_navier_utils.py:651-664): route the per-step saddle
        # solves through the matrix-free Krylov path
        linsolver = "krylov"
    scheme = {"cnab": timeint.cnab, "sbdf2": timeint.sbdf2}[time_int_scheme]

    ckpt_active = save_data or useolddata or clearprvdata

    def integrate(tpiece, resume_carry=None):
        return scheme(
            trange=tpiece, prob=prob, inivel=iniv, inip=inip,
            stokes_flow=stokes_flow,
            f_tdp=f_tdp, g_tdp=g_tdp,
            dynamic_rhs=dynamic_rhs, dynamic_rhs_memory=dynamic_rhs_memory,
            controls=controls, check_ff_maxv=check_ff_maxv,
            umat=umat, vmat=vmat, linsolver=linsolver,
            # checkpoint carries are stored in the inner layout; keep
            # every section on it so resumed sections match
            state_layout="inner" if ckpt_active else state_layout,
            save_every=save_every, resume_carry=resume_carry,
            verbose=verbose, **kw)

    if save_data or useolddata or clearprvdata:
        # trajectory checkpoint store keyed like the reference's per-step
        # cache (get_datastr_snu, stokes_navier_utils.py:21-37,:950-1070);
        # checkpoints carry the full scan state, so a resumed run
        # reproduces the uninterrupted trajectory EXACTLY (the reference
        # re-bootstraps from the last stored velocity)
        from ..utils.io import get_datastr

        nts = len(trange) - 1

        def ckpt_path(t):
            key = get_datastr(time=float(t), meshp=prob.nv_full, nu=prob.nu,
                              Nts=nts, data_prfx=data_prfx, semiexpl=True)
            return key + "__carry.npz"

        if clearprvdata:
            pat = get_datastr(time=None, meshp=prob.nv_full, nu=prob.nu,
                              Nts=nts, data_prfx=data_prfx, semiexpl=True)
            for f in glob.glob(pat.replace("timeNone", "time*")
                               + "__carry.npz"):
                os.remove(f)

        k_ck = checkpoint_every or max(1, nts // 4)
        # checkpoint indices: multiples of k_ck (skipping 0/1 where the
        # bootstrap lives), always including the final step
        ckinds = [i for i in range(k_ck, nts, k_ck) if i >= 2] + [nts]

        i_start, carry = 0, None
        if useolddata:
            for i in sorted(ckinds, reverse=True):
                pth = ckpt_path(trange[i])
                if os.path.exists(pth):
                    carry = _carry_from_npz(pth, time_int_scheme)
                    i_start = i
                    break

        pieces = []
        bounds = [i for i in ckinds if i > i_start]
        if not bounds:
            # the stored final checkpoint already covers the horizon
            v = carry["v"]
            return dict(v=v, p=carry["p"], ffflag=bool(carry["flag"]),
                        times=None, vs=None, ps=None, carry=carry,
                        iniv=iniv, inip=inip, resumed_from=float(
                            trange[i_start]))
        lo = i_start
        for hi in bounds:
            out = integrate(trange[lo:hi + 1],
                            resume_carry=carry)
            carry = out["carry"]
            if save_data:
                os.makedirs(os.path.dirname(ckpt_path(trange[hi])) or ".",
                            exist_ok=True)
                np.savez(ckpt_path(trange[hi]), **_carry_to_host(carry))
            pieces.append(out)
            lo = hi
        out = pieces[-1]
        if len(pieces) > 1 and out["times"] is not None:
            out["times"] = np.concatenate(
                [np.asarray(p["times"]) for p in pieces
                 if p["times"] is not None])
            out["vs"] = np.concatenate(
                [np.asarray(p["vs"]) for p in pieces
                 if p["vs"] is not None])
            out["ps"] = np.concatenate(
                [np.asarray(p["ps"]) for p in pieces
                 if p["ps"] is not None])
            out["ffflag"] = any(p["ffflag"] for p in pieces)
    else:
        out = integrate(trange)
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
