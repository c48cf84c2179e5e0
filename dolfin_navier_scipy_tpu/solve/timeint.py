"""Time integrators as ``lax.scan`` device loops.

Re-designs the reference's ``time_int_utils`` (cnab :23-145, sbdftwo
:260-355, _onestepheun :366-477, semi_implicit_euler :566-635) for TPU:

* the steps are solved in INCREMENT form: ``v_n = v_c + delta`` with a
  saddle solve for the O(dt)-sized increment, so f32 device kernels
  deliver f64-grade trajectories against an f64 carry (TPUs have no
  fast f64 — this replaces the reference's f64 splu),
* the coefficient matrix ``[[M + theta dt A, J^T],[J, 0]]`` is factorized
  ONCE (the property that makes the reference's CNAB loop fast,
  time_int_utils.py:89-91) as an :class:`InverseSaddleSolver` (dense
  MXU inverse, <20k dofs) or :class:`SchurSaddleSolver` (block-Schur,
  beyond),
* plain runs take the full-dof state layout (:func:`build_full_layout`)
  — no per-step inner<->full index translation,
* the convection vector is re-assembled on device each step by the
  :class:`ConvectionKernel` (the reference crosses into FEniCS assembly
  every step — the dominant cost, SURVEY.md 3.3),
* the mode-tagged callback protocol (getbcs/dynamic_rhs ``memory`` dicts)
  becomes pure functions with explicit scan carry,
* the blow-up check (time_int_utils.py:99-103) becomes a carried flag
  that freezes the state instead of ``break``,
* ALL device buffers (inverse, ELL operators, element tables) travel as
  pytree *arguments* through ``jax.jit`` — never as closed-over
  constants, which would be embedded into the HLO (breaking compile-size
  limits and executable caching).

Sign conventions: ``nfc = -N(v)v`` goes to the rhs with plus signs
(get_v_conv_conts ``semi_explicit``, stokes_navier_utils.py:103-107);
the raw saddle pressure is rescaled ``p = -q/dt`` (time_int_utils.py:137).
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.sparse import ell_from_scipy_fast
from .sadpnt import InverseSaddleSolver, host_saddle_factorized

# warm-started in-scan PCG iteration count with the extrapolated start
# (see the fstep comment in cnab); the cold count stays solver.ncg
_NITER_WARM = 6


@dataclass
class DirichletControl:
    """Time/state-dependent Dirichlet boundary control.

    ``dofs`` are *full-space* velocity dofs (must be excluded from the
    problem's inner dofs at build time); ``stencil`` is the spatial shape
    (e.g. a rotating-cylinder tangent field);
    ``ufunc(t, v_full, p, memory, mode) -> (scalar, memory)`` is a pure
    function scaling the stencil — the analogue of the reference's
    ``diricontfuncs`` memory-dict protocol (stokes_navier_utils.py:164-183).
    """

    dofs: np.ndarray
    stencil: np.ndarray
    ufunc: Callable
    memory: object = None


@jax.tree_util.register_pytree_node_class
class TimeIntOps:
    """Device operator bundle (pytree) for the semi-explicit integrators."""

    def __init__(self, solver, M, A, dt, theta, E=None,
                 wdtype=jnp.float64):
        self.solver = solver
        self.M = M
        self.A = A
        self.E = E          # fused explicit operator M - theta*dt*A
        self.dt = dt
        self.theta = theta
        self.nin = M.shape[0]
        self.wdtype = wdtype   # per-step work precision (f32 on TPU)

    def e_matvec(self, v):
        """``(M - theta dt A) @ v`` — one fused pass when available."""
        if self.E is not None:
            return self.E.matvec(v)
        return self.M.matvec(v) - self.theta * self.dt * self.A.matvec(v)

    def tree_flatten(self):
        return ((self.solver, self.M, self.A, self.E),
                (self.dt, self.theta, self.nin, self.wdtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.solver, obj.M, obj.A, obj.E = children
        obj.dt, obj.theta, obj.nin, obj.wdtype = aux
        return obj


def _build_ops(prob, dt, theta, inv_dtype=None, refine=None,
               precision="accurate", linsolver="auto", work_dtype=None,
               layout="inner", winv=None):
    """Operator/solver bundle for the INCREMENT-form integrators.

    The scan integrators advance ``v_n = v_c + delta`` with a saddle
    solve for the O(dt)-sized increment, so per-step arithmetic only
    needs *relative* f32 accuracy on ``delta`` to deliver f64-grade
    trajectories (the carry accumulates in f64).  Work precision:

    * ``precision='fast'``: f32 operators everywhere,
    * ``precision='accurate'``: f64 operators on CPU (bitwise reference
      for the tests), f32 operators + the device-built f32 inverse on
      TPU — same speed as 'fast', f64-grade trajectory via the increment
      form (TPUs have no fast f64; this is the TPU-native answer to the
      reference's f64 splu, time_int_utils.py:89-91).

    ``linsolver``: 'dense' (precomputed saddle inverse; O(n^2) memory,
    best below ~20k dofs), 'krylov' (matrix-free GMRES with a
    SIMPLE-type Schur preconditioner; scales to large meshes), or
    'auto' (dense below 20k dofs).
    """
    import jax.numpy as _jnp
    import scipy.sparse as sps

    if work_dtype is None:
        on_acc = jax.default_backend() != "cpu"
        work_dtype = (_jnp.float64
                      if (precision != "fast" and not on_acc)
                      else _jnp.float32)
    if linsolver == "auto":
        # the banded block-Schur solve beats the dense-inverse apply
        # from ~8k dofs up on the current toolchain (lvl1 measured:
        # banded 1559/1208 steps/s refine 0/1 vs dense 922 — the dense
        # apply reads O(n^2) HBM bytes, the banded solve O(n bs); the
        # crossover sits below lvl1, dense keeps only the tiny-problem
        # regime where its one-matmul step is unbeatable)
        n_all = len(prob.invinds) + prob.np_cond
        linsolver = "dense" if n_all <= 6000 else "schur"
    if linsolver == "krylov":
        from .krylov_saddle import build_krylov_ops

        return build_krylov_ops(
            prob, dt, theta=theta,
            dtype=work_dtype,
            tol=1e-7 if work_dtype == _jnp.float32 else 1e-11)
    if linsolver == "schur":
        from .sadpnt import SchurSaddleSolver

        coeff = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
        if layout == "full":
            # full-dof fast layout: the solver works on the full
            # velocity dof set; its zero-padded Jacobi diagonal masks
            # the bc rows (see SchurSaddleSolver full_map)
            from ..ops.affine import AffineVectorOps

            afful = AffineVectorOps.build(prob, work_dtype,
                                          full_dofs=True)
            # the PCG F-application uses precomputed per-element DENSE
            # blocks (gather + one batched 12x12 matmul + one scatter ~ 4
            # XLA ops) instead of the affine geometry pipeline (~7 ops):
            # the in-scan solve is op-LAUNCH-bound on the axon runtime
            # (~15-20 us/op, docs/PERF_NOTES.md), so fewer/fatter ops win
            # (measured 165 vs 101 steps/s at lvl1, 14 warm iterations)
            from ..ops.elementop import ElementOp

            vd = prob.space.vdofs_of_cells().reshape(
                -1, prob.ctx.N2.shape[1] * getattr(prob.ctx, "dim", 2))
            fel = (prob.elem_tensors["M"]
                   + theta * dt * prob.elem_tensors["A"])
            fop = ElementOp(_jnp.asarray(fel, work_dtype),
                            _jnp.asarray(vd), prob.nv_full)
            solver = SchurSaddleSolver(
                coeff, prob.Jc, prob.JTc,
                res_ops=(fop, afful.view("j")),
                dtype=work_dtype,
                full_map=(prob.invinds, prob.nv_full),
                band_extra=prob.Ac,
                index_nvals=int(np.prod(vd.shape)),
                winv=winv)
            ops = TimeIntOps(solver=solver, M=afful.view("m"),
                             A=afful.view("a"), dt=dt, theta=theta,
                             wdtype=work_dtype)
            ops.full_schur = afful
            return ops
        aff = getattr(prob, "affine_ops", lambda *_: None)(work_dtype)
        if aff is not None:
            res_ops = (aff.view("ma", cm=1.0, ca=theta * dt),
                       aff.view("j"))
            Mop, Aop = aff.view("m"), aff.view("a")
            Eop = aff.view("ma", cm=1.0, ca=-theta * dt)
        else:
            res_ops = None
            Mop = ell_from_scipy_fast(prob.Mc, dtype=work_dtype)
            Aop = ell_from_scipy_fast(prob.Ac, dtype=work_dtype)
            Eop = None
        nvc = prob.space.vdofs_of_cells()
        solver = SchurSaddleSolver(coeff, prob.Jc, prob.JTc,
                                   res_ops=res_ops, dtype=work_dtype,
                                   index_nvals=int(np.prod(nvc.shape)),
                                   winv=winv)
        return TimeIntOps(solver=solver, M=Mop, A=Aop, E=Eop,
                          dt=dt, theta=theta, wdtype=work_dtype)

    coeff = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
    aff = getattr(prob, "affine_ops", lambda *_: None)(work_dtype)
    if refine is None:
        # increment solves need only relative-to-delta accuracy; one
        # residual round (in work precision, cheap) covers the
        # device-built inverse's ~1e-5 quality
        refine = 1 if work_dtype == _jnp.float32 else 0
    if aff is not None:
        # affine-factorized fused matvecs: constant-weight MXU matmuls
        # + per-element 2x2 geometry contractions (the fast path)
        Mop, Aop, Jop = aff.view("m"), aff.view("a"), aff.view("j")
        Kop = aff.view("ma", cm=1.0, ca=theta * dt)
        Eop = aff.view("ma", cm=1.0, ca=-theta * dt)
        solver = InverseSaddleSolver(coeff, prob.Jc, prob.JTc,
                                     dtype=work_dtype,
                                     inv_dtype=inv_dtype, refine=refine,
                                     res_ops=(Kop, Jop))
        return TimeIntOps(solver=solver, M=Mop, A=Aop, E=Eop,
                          dt=dt, theta=theta, wdtype=work_dtype)
    solver = InverseSaddleSolver(coeff, prob.Jc, prob.JTc,
                                 dtype=work_dtype,
                                 inv_dtype=inv_dtype, refine=refine)
    return TimeIntOps(solver=solver,
                      M=ell_from_scipy_fast(prob.Mc, dtype=work_dtype),
                      A=ell_from_scipy_fast(prob.Ac, dtype=work_dtype),
                      dt=dt, theta=theta, wdtype=work_dtype)


def build_full_layout(prob, dt, ops):
    """Full-dof state layout for the dense-solver CNAB scan.

    Per-step inner<->full index translation (embed scatter + extract
    gather) costs ~0.4 ms at 8k dofs on v5e — comparable to all operator
    applications combined.  Instead: matvecs over the FULL velocity
    vector (``AffineVectorOps.build(full_dofs=True)``; bc rows carry
    element garbage) and the dense saddle inverse zero-padded onto the
    full dof set — its zero bc rows/columns mask the garbage AND pin the
    bc increments to zero.  The bc-column stiffness term ``A[:,bc] u_bc``
    moves from the folded ``fv`` back into the matvec.
    """
    from ..ops.affine import AffineVectorOps

    w = ops.wdtype
    # cache ON the problem object (an id(prob)-keyed module dict broke
    # when CPython reused ids of collected problems)
    cache = getattr(prob, "_full_layouts", None)
    if cache is None:
        cache = {}
        prob._full_layouts = cache
    key = (float(dt), float(ops.theta), str(w))
    if key in cache:
        return cache[key]
    aff = AffineVectorOps.build(prob, w, full_dofs=True)
    nf = prob.nv_full
    npp = prob.np_cond
    ix = jnp.concatenate([jnp.asarray(prob.invinds),
                          nf + jnp.arange(npp)])
    zdt = ops.solver.Kinv.dtype
    # Pallas inverse apply (opt-in via DNS_TPU_PALLAS=1): measured
    # IN-SCAN at lvl1 the XLA dot wins (503 us vs 542 us best-tile
    # Pallas — the 1024-granular zero padding costs more than the
    # streaming-bandwidth edge; docs/PERF_NOTES.md round-3 table), so
    # XLA stays the default; the Pallas path remains for experiments
    use_pallas = (os.environ.get("DNS_TPU_PALLAS", "0") == "1"
                  and zdt == jnp.float32
                  and jax.default_backend() not in ("cpu",))
    n_all = nf + npp
    if use_pallas:
        n_pad = ((n_all + 1023) // 1024) * 1024
        ZpT = jnp.zeros((n_pad, n_pad), jnp.float32)
        # Zp^T scattered directly: (Kinv^T)[ix, ix] blocks
        ZpT = ZpT.at[ix[:, None], ix[None, :]].set(ops.solver.Kinv.T)
        Zp = None
    else:
        n_pad = 0
        ZpT = None
        Zp = jnp.zeros((n_all, n_all), zdt)
        Zp = Zp.at[ix[:, None], ix[None, :]].set(ops.solver.Kinv)
    fvbc = -np.asarray(prob.full["A"]
                       @ prob.bc_full_vec()).ravel()[prob.invinds]
    fvf = np.zeros(nf)
    fvf[prob.invinds] = np.asarray(prob.fv).ravel() - fvbc
    out = dict(aff=aff, Zp=Zp, ZpT=ZpT, n_pad=n_pad,
               fv=jnp.asarray(fvf, w),
               nf=nf, npp=npp, w=w, nu=float(prob.nu),
               sym=bool(getattr(prob, "gradvsymmtrc", True)))
    cache[key] = out
    return out


def _control_blocks(prob, controls):
    """Dense column blocks (A, J, M)[:, control-dofs] and stencil layout.

    These are pytree-friendly dicts of device arrays.
    """
    if not controls:
        return None
    dofs = np.concatenate([np.asarray(c.dofs) for c in controls])
    Afull, Jfull, Mfull = prob.full["A"], prob.full["J"], prob.full["M"]
    Abc = jnp.asarray(np.asarray(Afull[:, dofs].todense())[prob.invinds])
    Jbc = jnp.asarray(np.asarray(Jfull[:, dofs].todense()))
    if prob.geo.ppin is not None:
        Jbc = Jbc[:-1]
    Mbc = jnp.asarray(np.asarray(Mfull[:, dofs].todense())[prob.invinds])
    stencils = [jnp.asarray(np.asarray(c.stencil)) for c in controls]
    return dict(dofs=jnp.asarray(dofs), Abc=Abc, Jbc=Jbc, Mbc=Mbc,
                stencils=stencils)


def _kern(prob, precision):
    if precision == "fast" and hasattr(prob, "conv_kernel_f32"):
        return prob.conv_kernel_f32
    return prob.conv_kernel


def _consts(prob, controls):
    """Static per-problem device vectors, passed through jit as args."""
    return dict(
        invinds=jnp.asarray(prob.invinds),
        v_bc=jnp.asarray(prob.bc_full_vec()),
        fv=jnp.asarray(np.asarray(prob.fv).ravel()),
        fp=jnp.asarray(np.asarray(prob.fp).ravel()),
        cb=_control_blocks(prob, controls),
    )


def _eval_controls(controls, cn, t, v_full, p, mems, mode):
    """-> (cvals concatenated, new memories, bfv, bfp, mbc)."""
    if not controls:
        return None, (), 0.0, 0.0, 0.0
    cb = cn["cb"]
    vals, newmems = [], []
    for c, stn, mem in zip(controls, cb["stencils"], mems):
        scal, mem = c.ufunc(t, v_full, p, mem, mode)
        vals.append(scal * stn)
        newmems.append(mem)
    cvals = jnp.concatenate(vals)
    bfv = -(cb["Abc"] @ cvals)
    bfp = -(cb["Jbc"] @ cvals)
    mbc = cb["Mbc"] @ cvals
    return cvals, tuple(newmems), bfv, bfp, mbc


def _embed(cn, has_controls, v_inner, cvals):
    full = cn["v_bc"].at[cn["invinds"]].set(v_inner)
    if has_controls:
        full = full.at[cn["cb"]["dofs"]].set(cvals)
    return full


def _zero_fns(prob, f_tdp, g_tdp, dynamic_rhs):
    nin = len(prob.invinds)
    npc = prob.np_cond
    fv = jnp.asarray(np.asarray(prob.fv).ravel())
    fp = jnp.asarray(np.asarray(prob.fp).ravel())
    if f_tdp is None:
        f_tdp = lambda t: fv                       # noqa: E731
    if g_tdp is None:
        g_tdp = lambda t: fp                       # noqa: E731
    if dynamic_rhs is None:
        zero = jnp.zeros((nin,))

        def dynamic_rhs(t, vc=None, memory=None, mode=None):
            return zero, memory

    return f_tdp, g_tdp, dynamic_rhs, npc


def ell_matvec_np(spmat, x):
    """scipy matvec on a jax/numpy vector, returning jnp."""
    return jnp.asarray(spmat @ np.asarray(x))


def _heun_bootstrap(prob, t0, t1, v0, p0, f_vdp, f_tdp, g_tdp,
                    dynamic_rhs, drm, controls, cn,
                    predictor="IMEX-Euler", umat=None, vmat=None):
    """One Heun (predictor/corrector) step on the host
    (time_int_utils.py:366-477); runs once, outside the scan.

    Static feedback ``A -> A - umat @ vmat`` is implicit in the predictor
    solve and explicit-trapezoidal in the corrector (mirroring how the
    viscous term is treated)."""
    dt = t1 - t0
    if umat is not None:
        U = np.asarray(umat.todense() if hasattr(umat, "todense")
                       else umat, dtype=np.float64)
        V = np.asarray(vmat.todense() if hasattr(vmat, "todense")
                       else vmat, dtype=np.float64)

        def fb(v):
            return jnp.asarray(U @ (V @ np.asarray(v)))
    else:
        U = V = None
        fb = None
    nin = len(prob.invinds)
    has_c = bool(controls)

    def embed(v, cvals):
        return _embed(cn, has_c, v, cvals)

    mems0 = tuple(c.memory for c in (controls or []))
    zero_c = (jnp.zeros(sum(len(np.asarray(c.dofs)) for c in controls))
              if has_c else None)
    cvals_c, cmems, bfv_c, bfp_c, mbc_c = _eval_controls(
        controls, cn, t0, embed(v0, zero_c), p0, mems0, "init")
    v0f = embed(v0, cvals_c)
    fv_c = f_tdp(t0)
    nfc_c = f_vdp(v0f)
    dfv_c, drm = dynamic_rhs(t0, vc=v0, memory=drm, mode="init")
    tdfv, drm = dynamic_rhs(t1, vc=v0, memory=drm, mode="heunpred")

    tcvals, cmems, tbfv, tbfp, tmbc = _eval_controls(
        controls, cn, t1, v0f, p0, cmems, "heunpred")
    fv_n, fp_n = f_tdp(t1), g_tdp(t1)

    Mv0 = ell_matvec_np(prob.Mc, v0)
    Av0 = ell_matvec_np(prob.Ac, v0)
    if predictor == "IMEX-Euler":
        tfv = Mv0 + dt * (fv_n + tbfv + tdfv) + dt * nfc_c - (tmbc - mbc_c)
        pre_amat, pre_uscal = prob.Mc + dt * prob.Ac, dt
    else:  # IMEX-trpz
        tfv = (Mv0 - 0.5 * dt * Av0
               + 0.5 * dt * (fv_c + fv_n + tbfv + bfv_c + tdfv + dfv_c)
               + dt * nfc_c - (tmbc - mbc_c))
        if fb is not None:
            tfv = tfv + 0.5 * dt * fb(v0)
        pre_uscal = 0.5 * dt
        pre_amat = prob.Mc + 0.5 * dt * prob.Ac
    if fb is None:
        presolve = host_saddle_factorized(pre_amat, prob.Jc, prob.JTc)
        tvp = presolve(np.asarray(tfv), np.asarray(fp_n + tbfp))
    else:
        from .sadpnt import solve_sadpnt_host

        tvp = solve_sadpnt_host(
            amat=pre_amat, jmat=prob.Jc, jmatT=prob.JTc,
            rhsv=np.asarray(tfv), rhsp=np.asarray(fp_n + tbfp),
            umat=pre_uscal * U, vmat=V)
    tv_n = jnp.asarray(tvp[:nin].ravel())
    tp_n = -jnp.asarray(tvp[nin:].ravel()) / dt

    # corrector: explicit trapezoidal, implicit only in the projection
    dfv_n, drm = dynamic_rhs(t1, vc=tv_n, memory=drm, mode="heuncorr")
    tvf = embed(tv_n, tcvals)
    tnfc_n = f_vdp(tvf)
    cvals_n, cmems, bfv_n, bfp_n, mbc_n = _eval_controls(
        controls, cn, t1, tvf, tp_n, cmems, "heuncorr")
    rhs_n = (Mv0 - (mbc_n - mbc_c)
             - 0.5 * dt * (Av0 + ell_matvec_np(prob.Ac, tv_n))
             + 0.5 * dt * (fv_c + fv_n + bfv_n + bfv_c + dfv_n + dfv_c
                           + nfc_c + tnfc_n))
    if fb is not None:
        rhs_n = rhs_n + 0.5 * dt * (fb(v0) + fb(tv_n))
    msolve = host_saddle_factorized(prob.Mc, prob.Jc, prob.JTc)
    vp = msolve(np.asarray(rhs_n), np.asarray(fp_n + bfp_n))
    v_n = jnp.asarray(vp[:nin].ravel())
    p_n = -jnp.asarray(vp[nin:].ravel()) / dt
    nfc_n = f_vdp(embed(v_n, cvals_n))
    return dict(v=v_n, p=p_n, nfc_c=nfc_c, nfc_n=nfc_n, fv_n=fv_n,
                dfv_n=dfv_n, drm=drm, cvals=cvals_n, cmems=cmems,
                bfv=bfv_n, mbc=mbc_n, mbc_c=mbc_c,
                gp=jnp.asarray(fp_n + bfp_n) + jnp.zeros_like(fp_n),
                v_pred=tv_n, p_pred=tp_n)


@partial(jax.jit, static_argnames=("step", "save_every", "nsteps",
                                   "outfunc"))
def _scan_jit(step, bundle, carry, ts, save_every, nsteps, outfunc=None):
    """Scan with decimated trajectory output; ``bundle`` carries all
    device buffers as traced pytree args.  ``outfunc(bundle, c_new,
    c_old)`` (optional, static) is evaluated at EVERY step and its
    stacked values returned alongside — the in-scan observable hook
    (e.g. per-step lift/drag, models/functionals.make_inscan_liftdrag)
    replacing the reference's per-step host callbacks
    (tests/tdp_2D_simu.py:68-130)."""

    def body(cc, t):
        cn = step(bundle, cc, t)
        return cn, (None if outfunc is None else outfunc(bundle, cn, cc))

    if save_every is None or save_every <= 0:
        carry, outs = lax.scan(body, carry, ts)
        return carry, None, outs
    k = save_every
    nfull = nsteps // k
    ys, outs = None, None
    if nfull:
        def chunk(c, tchunk):
            c, o = lax.scan(body, c, tchunk)
            return c, ((c["v"], c["p"]), o)

        carry, (ys, outs) = lax.scan(chunk, carry,
                                     ts[: nfull * k].reshape(nfull, k))
        if outfunc is not None:
            outs = outs.reshape((nfull * k,) + outs.shape[2:])
    if nsteps % k:
        carry, otail = lax.scan(body, carry, ts[nfull * k:])
        if outfunc is not None:
            outs = (otail if outs is None
                    else jnp.concatenate([outs, otail], axis=0))
    return carry, ys, outs


def _run_scan(step, bundle, carry, ts, save_every, outfunc=None):
    n = len(ts)
    carry, ys, outs = _scan_jit(step, bundle, carry, jnp.asarray(ts),
                                save_every, n, outfunc)
    if ys is None:
        return carry, None, None, outs
    k = save_every
    tout = np.asarray(ts[: (n // k) * k]).reshape(-1, k)[:, -1]
    return carry, ys, tout, outs


def _wrap_feedback(ops, umat, vmat, c):
    """Fold the static low-rank feedback ``A -> A - umat @ vmat`` into the
    reusable solver (SMW, precomputed once) and return the device
    ``(umat, vmat)`` pair for the explicit rhs half."""
    if umat is None:
        return ops, None
    from .sadpnt import SMWSolver

    U = np.asarray(umat.todense() if hasattr(umat, "todense") else umat,
                   dtype=np.float64)
    V = np.asarray(vmat.todense() if hasattr(vmat, "todense") else vmat,
                   dtype=np.float64)
    wrapped = TimeIntOps(solver=SMWSolver(base=ops.solver, umat=U, vmat=V,
                                          c=c),
                         M=ops.M, A=ops.A, E=ops.E,
                         dt=ops.dt, theta=ops.theta, wdtype=ops.wdtype)
    return wrapped, (jnp.asarray(U), jnp.asarray(V))


def _restore_carry(carry):
    """Re-device a stored scan carry: array leaves -> jnp, scalars/None
    kept as-is (they are static constants inside the scan body)."""
    def _restore(val):
        return jnp.asarray(val) if hasattr(val, "dtype") else val

    return jax.tree_util.tree_map(_restore, carry)


def _make_f_vdp(stokes_flow, nin):
    if stokes_flow:
        def f_vdp(bundle, v_full):
            return jnp.zeros((nin,))
    else:
        def f_vdp(bundle, v_full):
            cn = bundle["cn"]
            return -bundle["kern"].vector(v_full)[cn["invinds"]]
    return f_vdp


def cnab(trange=None, prob=None, inivel=None, inip=None,
         stokes_flow=False,
         f_tdp=None, g_tdp=None, dynamic_rhs=None, dynamic_rhs_memory=None,
         controls: Optional[List[DirichletControl]] = None,
         check_ff_maxv=1e8, save_every=1,
         predictor="IMEX-Euler",
         inv_dtype=None, refine=None, ops=None, precision="accurate",
         linsolver="auto", state_layout="auto", warm_refine=0,
         resume_carry=None, umat=None, vmat=None,
         outfunc=None, out_bundle=None, winv=None,
         verbose=False, **kw):
    """Crank-Nicolson / Adams-Bashforth-2 (reference time_int_utils.py:23).

    ``outfunc(bundle, c_new, c_old)``: optional per-step observable
    evaluated INSIDE the scan (stacked into the returned ``outs``; see
    models/functionals.make_inscan_liftdrag).  ``out_bundle`` is a
    pytree of device buffers made available as ``bundle['ob']`` (pass
    large arrays here, never close over them — remote-compile limits).

    ``warm_refine``: short residual-correction rounds appended to each
    in-scan warm Schur solve (full-layout block-Schur path only) — buys
    the <=1e-6 trajectory regime at ~2x the step cost (lvl1 measured:
    rel_err 9.6e-6 -> 6.1e-8); the f32 floor without it is the in-step
    solve tolerance (docs/PERF_NOTES.md section 4.3).

    Returns a dict with the final ``(v, p)``, the blow-up flag, the
    decimated trajectory ``(times, vs, ps)`` (device arrays), and the
    final scan ``carry``.  Passing a stored carry back via
    ``resume_carry`` continues the AB2 recursion *exactly* (no
    re-bootstrap) with ``trange[0]`` being the carry's time point — the
    checkpoint/resume mechanism (the reference restarts with a fresh
    Heun step from the last stored state, stokes_navier_utils.py:950-1070;
    the carried ``nfc`` makes our resume bit-exact instead).
    """
    trange = np.asarray(trange)
    dt = float(trange[1] - trange[0])
    plain_rhs = (f_tdp is None and g_tdp is None and dynamic_rhs is None)
    want_full = (state_layout != "inner" and not controls and plain_rhs
                 and not stokes_flow and umat is None
                 and resume_carry is None and hasattr(prob, "ctx"))
    if ops is None:
        n_all = len(prob.invinds) + prob.np_cond
        lin_res = (linsolver if linsolver != "auto"
                   else ("dense" if n_all <= 6000 else "schur"))
        ops = _build_ops(prob, dt, theta=0.5, inv_dtype=inv_dtype,
                         refine=refine, precision=precision,
                         linsolver=lin_res, winv=winv,
                         layout=("full" if (want_full
                                            and lin_res == "schur")
                                 else "inner"))
    ops, fbk = _wrap_feedback(ops, umat, vmat, c=0.5 * dt)
    nin = len(prob.invinds)
    cn = _consts(prob, controls)
    bundle = dict(ops=ops, kern=_kern(prob, precision), cn=cn, fbk=fbk,
                  ob=out_bundle)
    has_c = bool(controls)
    f_vdp_b = _make_f_vdp(stokes_flow, nin)
    f_tdp, g_tdp, dynamic_rhs, npc = _zero_fns(prob, f_tdp, g_tdp,
                                               dynamic_rhs)

    v0 = jnp.asarray(np.asarray(inivel).ravel())
    p0 = (jnp.zeros((npc,)) if inip is None
          else jnp.asarray(np.asarray(inip).ravel()))

    if resume_carry is None:
        bs = _heun_bootstrap(prob, trange[0], trange[1], v0, p0,
                             lambda vf: f_vdp_b(bundle, vf),
                             f_tdp, g_tdp, dynamic_rhs, dynamic_rhs_memory,
                             controls, cn, predictor=predictor,
                             umat=umat, vmat=vmat)
    else:
        bs = None

    # full-dof state layout: the fast path for plain runs (no per-step
    # inner<->full index translation; see build_full_layout).  Two
    # flavors: dense (zero-padded inverse Zp) and Schur (full_map-built
    # solver, _build_ops layout='full').
    schur_full = hasattr(ops, "full_schur")
    use_full = want_full and (schur_full or (
        hasattr(ops.solver, "Kinv")
        # only when the ops were built on the affine element
        # kernels of THIS problem (augmented/modified-operator
        # problems take the generic inner path)
        and getattr(ops.solver, "res_ops", None) is not None))
    if use_full:
        split = (schur_full
                 and getattr(ops.solver, "Eblk", None) is not None)
        if schur_full:
            afful = ops.full_schur
            w = ops.wdtype
            fvf = np.zeros(prob.nv_full)
            if split:
                # conv/A split: the explicit diffusion rides the BANDED
                # A (inner rows only) — the constant A_ib bc coupling
                # then cancels the fvbc fold exactly:
                # -dt (A v)_i + dt (fv + A_ib v_bc) = -dt A_ii v_i + dt fv
                fvf[prob.invinds] = np.asarray(prob.fv).ravel()
            else:
                fvbc = -np.asarray(
                    prob.full["A"]
                    @ prob.bc_full_vec()).ravel()[prob.invinds]
                fvf[prob.invinds] = np.asarray(prob.fv).ravel() - fvbc
            fl = dict(aff=afful, Zp=None, fv=jnp.asarray(fvf, w),
                      nf=prob.nv_full, npp=prob.np_cond, w=w,
                      nu=float(prob.nu),
                      sym=bool(getattr(prob, "gradvsymmtrc", True)))
        else:
            fl = build_full_layout(prob, dt, ops)
        nf = fl["nf"]
        kern_w = (_kern(prob, "fast") if fl["w"] == jnp.float32
                  else _kern(prob, "accurate"))
        # PERMUTED state layout (w-space): with the banded Schur solver
        # the state lives as [v_inner in RCM order; bc dofs] — the
        # solver's rhs is then a SLICE of the step's rhs (no per-solve
        # gather/scatter at all), the element tables are re-indexed once
        # at build, and natural order is restored only at save/exit.
        use_w = (schur_full
                 and getattr(ops.solver, "Bblk", None) is not None)
        fp_nat = jnp.asarray(np.asarray(prob.fp).ravel())
        if use_w:
            slv = ops.solver
            wsrc = np.concatenate([
                np.asarray(slv.permf),
                np.setdiff1d(np.arange(prob.nv_full),
                             np.asarray(prob.invinds))]).astype(np.int64)
            iposx = np.full(prob.nv_full + 1, prob.nv_full, np.int32)
            iposx[wsrc] = np.arange(prob.nv_full, dtype=np.int32)
            qpos = np.argsort(np.asarray(slv.pidx))   # pp -> natural
            kern_w = kern_w.with_dof_map(jnp.asarray(iposx))
            aff_fac_vdofs = fl["aff"].fac_vdofs
            if aff_fac_vdofs is not None:
                aff_fac_vdofs = jnp.asarray(iposx)[
                    jnp.minimum(aff_fac_vdofs, prob.nv_full)]
            fv_use = fl["fv"][jnp.asarray(wsrc)]
            fp_use = fp_nat[jnp.asarray(np.asarray(slv.pidx))]
        else:
            aff_fac_vdofs = fl["aff"].fac_vdofs
            fv_use = fl["fv"]
            fp_use = fp_nat
        fb = dict(aff=fl["aff"], Zp=fl["Zp"], ZpT=fl.get("ZpT"),
                  slv=ops.solver, fv=fv_use, kern=kern_w,
                  fp=fp_use, facv=aff_fac_vdofs,
                  ob=out_bundle)
        vf0 = np.asarray(prob.bc_full_vec()).copy()
        vf0[prob.invinds] = np.asarray(bs["v"])
        # the AB2 "previous convection" entering the first step is the
        # one at the ORIGINAL v0, not at the bootstrapped state
        # (time_int_utils.py:78+:112)
        v00 = np.asarray(prob.bc_full_vec()).copy()
        v00[prob.invinds] = np.asarray(v0)
        if use_w:
            vf0, v00 = vf0[wsrc], v00[wsrc]
        vf0 = jnp.asarray(vf0)
        nfc0 = (-kern_w.vector(jnp.asarray(v00))).astype(fl["w"])

        nin_p = getattr(ops.solver, "_nin", 0) if schur_full else 0

        # banded convection tail: in the w-space conv/A split the
        # element pipeline's gather/segment_sum is the step's last
        # index-op cost — replace it with static-window banded matmuls
        # when the predicted HBM stream beats it (ops/banded_conv.py;
        # 141 vs 407 us at lvl1).  Valid exactly in this branch: the
        # solver slices rhs[:nin] and the bc tail is scan-constant.
        bct = None
        if use_w and split:
            from ..ops.banded_conv import build_banded_conv_tail

            bct = build_banded_conv_tail(kern_w, nin_p,
                                         np.asarray(vf0[nin_p:]))
        use_bct = bct is not None
        if use_bct:
            fb["bct"] = bct

        def fstep(b, c, t):
            w = fl["w"]
            vf, nfc_o = c["v"], c["nfc"]
            if split:
                # conv/A split: the element pipeline carries ONLY the
                # nonlinear convection (half the scatter values); the
                # explicit diffusion is one banded matvec in permuted
                # inner space (~1/10 the element application cost at
                # lvl2+, docs/PERF_NOTES.md section 8)
                cv = (b["bct"].vector(vf) if use_bct
                      else b["kern"].vector(vf))
                nfc_c = (-cv).astype(w)
                av_i = b["slv"].band_extra_mv(vf[:nin_p])
                rhs = (jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
                       + jnp.asarray(dt, w) * b["fv"])
                rhs = rhs.at[:nin_p].add(
                    jnp.asarray(-dt, w) * av_i.astype(w))
            else:
                # fused element pipeline: convection + stiffness share
                # the gather and one stacked scatter
                cv, av = b["kern"].vector_and_amatvec(
                    vf, fl["nu"], sym=fl["sym"],
                    fac_elem=b["aff"].fac_elem, fac_vdofs=b["facv"])
                nfc_c = (-cv).astype(w)
                rhs = (jnp.asarray(-dt, w) * av.astype(w)
                       + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
                       + jnp.asarray(dt, w) * b["fv"])
            rp = (b["fp"] - c["gp"]).astype(w)
            if use_w:
                # permuted layout: the solver consumes rhs[:nin] as a
                # SLICE and returns the permuted inner increment + the
                # pp-ordered raw pressure (natural order restored only
                # at save/exit)
                y0 = 2.0 * c["ysol"] - c["ysol_p"]
                dvp, q_pp, y_n = b["slv"].solve_warm_wspace(
                    rhs, rp, y0, niter=_NITER_WARM, refine=warm_refine)
                v_n = vf + jnp.concatenate(
                    [dvp, jnp.zeros((nf - dvp.shape[0],), dvp.dtype)]
                ).astype(vf.dtype)
                p_n = (-q_pp / dt).astype(c["p"].dtype)
            elif schur_full:
                # warm-start the PCG by LINEAR EXTRAPOLATION of the two
                # previous F-solves: consecutive increment solves differ
                # by O(dt), the extrapolated start by O(dt^2) — 6 Jacobi
                # iterations then hold the same trajectory accuracy as 14
                # from a plain warm start (measured at lvl1: rel_err vs
                # the f64 oracle 9.8e-6 at ncg=6+extrap vs 8.5e-6 at
                # ncg=14; 4 iterations degrade to 7.6e-5)
                y0 = 2.0 * c["ysol"] - c["ysol_p"]
                sol, y_n = b["slv"].solve_warm(rhs, rp, y0,
                                               niter=_NITER_WARM,
                                               refine=warm_refine)
            elif fl.get("ZpT") is not None:
                # Pallas tiled vecmat on the padded transposed inverse
                # (531 vs 346 GB/s for the XLA dot; docs/PERF_NOTES.md)
                from ..ops.pallas_kernels import vecmat_pallas

                r_all = jnp.concatenate([rhs, rp]).astype(jnp.float32)
                rpad = jnp.zeros((fl["n_pad"],), jnp.float32)
                rpad = rpad.at[: nf + fl["npp"]].set(r_all)
                sol = vecmat_pallas(rpad, b["ZpT"])[: nf + fl["npp"]]
                y_n = None
            else:
                sol = b["Zp"] @ jnp.concatenate([rhs, rp])
                y_n = None
            if not use_w:
                v_n = vf + sol[:nf].astype(vf.dtype)
                p_n = (-sol[nf:] / dt).astype(c["p"].dtype)
            nrm = jnp.linalg.norm(v_n)
            bad = jnp.logical_or(nrm > check_ff_maxv, jnp.isnan(nrm))
            flag = jnp.logical_or(c["flag"], bad)
            out = dict(v=jnp.where(flag, vf, v_n),
                       p=jnp.where(flag, c["p"], p_n),
                       nfc=nfc_c, gp=b["fp"], flag=flag)
            if schur_full:
                out["ysol"] = jnp.where(flag, c["ysol"], y_n)
                out["ysol_p"] = jnp.where(flag, c["ysol_p"], c["ysol"])
            return out

        p0, gp0 = bs["p"], bs["gp"]
        outfunc_use = outfunc
        if use_w:
            pidx_j = jnp.asarray(np.asarray(ops.solver.pidx))
            p0 = jnp.asarray(p0)[pidx_j]
            gp0 = jnp.asarray(gp0)[pidx_j]
            if outfunc is not None:
                # outfunc's contract is NATURAL-ordered (v_full, p);
                # translate per step only when observables are on
                qpos_j = jnp.asarray(qpos)
                ip_j = jnp.asarray(iposx[: prob.nv_full])

                def outfunc_use(b, cn, cc, _of=outfunc):
                    cn2 = dict(cn, v=cn["v"][ip_j], p=cn["p"][qpos_j])
                    cc2 = dict(cc, v=cc["v"][ip_j], p=cc["p"][qpos_j])
                    return _of(b, cn2, cc2)
        carry = dict(v=vf0, p=p0, nfc=nfc0, gp=gp0,
                     flag=jnp.asarray(False))
        if schur_full:
            # banded solvers thread the PCG warm start in PERMUTED
            # inner space (solver.warm_size); the carry is opaque
            ysz = getattr(ops.solver, "warm_size", nf)
            carry["ysol"] = jnp.zeros((ysz,), fl["w"])
            carry["ysol_p"] = jnp.zeros((ysz,), fl["w"])
        carry, ys, tout, outs = _run_scan(fstep, fb, carry, trange[2:],
                                          save_every, outfunc_use)
        inv = prob.invinds
        if use_w:
            # restore natural order once, at exit (and per saved row)
            v_end = carry["v"][jnp.asarray(iposx[np.asarray(inv)])]
            p_end = carry["p"][jnp.asarray(qpos)]
            vs = None if ys is None else ys[0][
                :, np.asarray(iposx[np.asarray(inv)])]
            ps = None if ys is None else ys[1][:, np.asarray(qpos)]
        else:
            v_end = carry["v"][jnp.asarray(inv)]
            p_end = carry["p"]
            vs = None if ys is None else ys[0][:, np.asarray(inv)]
            ps = None if ys is None else ys[1]
        return dict(
            v=v_end, p=p_end,
            ffflag=bool(carry["flag"]),
            times=tout,
            vs=vs, ps=ps,
            outs=outs, out_times=np.asarray(trange[2:]),
            bootstrap=bs, ops=ops, carry=carry,
        )

    def step(b, c, t):
        # INCREMENT form: solve for delta = v_n - v_c.  With
        # K = M + dt/2 A and E = M - dt/2 A the CNAB update
        # K v_n = E v_c + w  becomes  K delta = -dt A v_c + w, where
        # every rhs term is O(dt): f32 work arithmetic then yields
        # f64-grade trajectories with the f64 carry.
        ops_, cn_ = b["ops"], b["cn"]
        w = ops_.wdtype
        nfc_o = c["nfc"]
        v_full = _embed(cn_, has_c, c["v"], c["cvals"])
        # per-step vector arithmetic stays in the work dtype: every term
        # is O(dt), and f64-typed chains run emulated elementwise on TPU
        nfc_c = f_vdp_b(b, v_full).astype(w)
        cvals_n, cmems, bfv_n, bfp_n, mbc_n = _eval_controls(
            controls, cn_, t, v_full, c["p"], c["cmems"], "abtwo")
        fv_n = f_tdp(t)
        dfv_n, drm_n = dynamic_rhs(t, vc=c["v"], memory=c["drm"],
                                   mode="abtwo")
        def _w(x):
            return x.astype(w) if hasattr(x, "astype") else x

        fsum = (_w(c["fv"]) + _w(fv_n) + _w(bfv_n) + _w(c["bfv"])
                + _w(dfv_n) + _w(c["dfv"]))
        rhs_d = (jnp.asarray(-dt, w) * ops_.A.matvec(c["v"]).astype(w)
                 - jnp.asarray(mbc_n - c["mbc"], w)
                 + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
                 + jnp.asarray(0.5 * dt, w) * fsum)
        if b["fbk"] is not None:
            # trapezoidal feedback: K' = K - dt/2 uv (in the SMW-wrapped
            # solver), E' = E + dt/2 uv, so the delta-rhs gains dt uv v_c
            fu, fvm = b["fbk"]
            rhs_d = rhs_d + jnp.asarray(dt, w) * (
                fu @ (fvm @ c["v"])).astype(w)
        # pressure-block rhs of the delta system: g_new - J v_c; by
        # div-free induction J v_c equals the PREVIOUS g, so the exact
        # O(dt) difference is formed in f64 before any work-dtype cast
        gp_n = g_tdp(t) + bfp_n
        sol = ops_.solver.solve(rhs_d, (gp_n - c["gp"]).astype(w))
        v_n = c["v"] + sol[:ops_.nin].astype(c["v"].dtype)
        p_n = (-sol[ops_.nin:] / dt).astype(c["p"].dtype)
        nrm = jnp.linalg.norm(v_n)
        bad = jnp.logical_or(nrm > check_ff_maxv, jnp.isnan(nrm))
        flag = jnp.logical_or(c["flag"], bad)
        v_n = jnp.where(flag, c["v"], v_n)
        p_n = jnp.where(flag, c["p"], p_n)
        return dict(v=v_n, p=p_n, nfc=nfc_c, fv=fv_n, dfv=dfv_n,
                    drm=drm_n, cvals=cvals_n, cmems=cmems, bfv=bfv_n,
                    mbc=mbc_n, gp=jnp.where(flag, c["gp"], gp_n),
                    flag=flag)

    if resume_carry is None:
        # the carried "previous" convection entering the first AB2 step is
        # the one at v0 (reference hands nfc_c from _onestepheun into the
        # loop, time_int_utils.py:78+:112)
        carry = dict(v=bs["v"], p=bs["p"],
                     nfc=bs["nfc_c"].astype(ops.wdtype), fv=bs["fv_n"],
                     dfv=bs["dfv_n"], drm=bs["drm"], cvals=bs["cvals"],
                     cmems=bs["cmems"], bfv=bs["bfv"], mbc=bs["mbc"],
                     gp=bs["gp"], flag=jnp.asarray(False))
        ts = trange[2:]
    else:
        carry = _restore_carry(resume_carry)
        ts = trange[1:]
    carry, ys, tout, outs = _run_scan(step, bundle, carry, ts, save_every,
                                      outfunc)

    return dict(
        v=carry["v"], p=carry["p"], ffflag=bool(carry["flag"]),
        times=tout, vs=None if ys is None else ys[0],
        ps=None if ys is None else ys[1],
        outs=outs, out_times=np.asarray(ts),
        bootstrap=bs, ops=ops, carry=carry,
    )


def sbdf2(trange=None, prob=None, inivel=None, inip=None,
          stokes_flow=False,
          f_tdp=None, g_tdp=None, dynamic_rhs=None, dynamic_rhs_memory=None,
          controls: Optional[List[DirichletControl]] = None,
          check_ff_maxv=1e8, save_every=1,
          inv_dtype=None, refine=None, ops=None, precision="accurate",
          linsolver="auto", state_layout="inner",
          resume_carry=None, umat=None, vmat=None,
          verbose=False, **kw):
    """Semi-implicit BDF2 (reference ``sbdftwo``, time_int_utils.py:260):
    implicit ``M + 2/3 dt A``, extrapolated convection ``2 N(v_c)-N(v_p)``.

    ``resume_carry`` continues the BDF2 recursion exactly from a stored
    scan carry (see :func:`cnab`)."""
    trange = np.asarray(trange)
    dt = float(trange[1] - trange[0])
    if ops is None:
        ops = _build_ops(prob, dt, theta=2.0 / 3.0, inv_dtype=inv_dtype,
                         refine=refine, precision=precision,
                         linsolver=linsolver)
    # BDF2 treats the linear feedback term fully implicitly: the 2/3 dt
    # weighted update is folded into the solver, no explicit rhs half
    ops, _fbk = _wrap_feedback(ops, umat, vmat, c=2.0 / 3.0 * dt)
    nin = len(prob.invinds)
    cn = _consts(prob, controls)
    bundle = dict(ops=ops, kern=_kern(prob, precision), cn=cn, fbk=_fbk)
    has_c = bool(controls)
    f_vdp_b = _make_f_vdp(stokes_flow, nin)
    f_tdp, g_tdp, dynamic_rhs, npc = _zero_fns(prob, f_tdp, g_tdp,
                                               dynamic_rhs)

    v0 = jnp.asarray(np.asarray(inivel).ravel())
    p0 = (jnp.zeros((npc,)) if inip is None
          else jnp.asarray(np.asarray(inip).ravel()))

    if resume_carry is None:
        bs = _heun_bootstrap(prob, trange[0], trange[1], v0, p0,
                             lambda vf: f_vdp_b(bundle, vf),
                             f_tdp, g_tdp, dynamic_rhs, dynamic_rhs_memory,
                             controls, cn, umat=umat, vmat=vmat)

        # previous-step control mass term for the 3-level mbc correction:
        # the bootstrap's t0 value (mode 'init') — re-evaluating the
        # ufuncs in 'abtwo' mode here would hand stateful controllers
        # (get_heunab_lti) a negative curdt = t0 - t1 (the reference uses
        # the initial bc mass term from _onestepheun,
        # time_int_utils.py:333-345)
        mbc_p0 = bs["mbc_c"] if controls else 0.0
    else:
        bs = None

    def step(b, c, t):
        # INCREMENT form: with K2 = M + 2/3 dt A, the BDF2 update
        # K2 v_n = 1/3 M (4 v_c - v_p) + w  becomes
        # K2 delta = 1/3 M delta_old - 2/3 dt A v_c + w  with
        # delta_old = v_c - v_p; all rhs terms are O(dt) (see cnab)
        ops_, cn_ = b["ops"], b["cn"]
        w = ops_.wdtype
        nfc_p = c["nfc_p"]
        v_full = _embed(cn_, has_c, c["v"], c["cvals"])
        nfc_c = f_vdp_b(b, v_full).astype(w)
        cvals_n, cmems, bfv_n, bfp_n, mbc_n = _eval_controls(
            controls, cn_, t, v_full, c["p"], c["cmems"], "abtwo")
        fv_n = f_tdp(t)
        dfv_n, drm_n = dynamic_rhs(t, vc=c["v"], memory=c["drm"],
                                   mode="abtwo")

        def _w(x):
            return x.astype(w) if hasattr(x, "astype") else x

        rhs_d = (jnp.asarray(1.0 / 3.0, w) * ops_.M.matvec(c["dv"]).astype(w)
                 - jnp.asarray(2.0 / 3.0 * dt, w)
                 * ops_.A.matvec(c["v"]).astype(w)
                 - jnp.asarray(mbc_n - 4.0 / 3.0 * c["mbc"]
                               + 1.0 / 3.0 * c["mbc_p"], w)
                 + jnp.asarray(2.0 / 3.0 * dt, w) * _w(bfv_n)
                 + jnp.asarray(2.0 / 3.0 * dt, w) * (2.0 * nfc_c - nfc_p)
                 + jnp.asarray(2.0 / 3.0 * dt, w) * (_w(fv_n) + _w(dfv_n)))
        if b["fbk"] is not None:
            # fully-implicit feedback: K2' = K2 - 2/3 dt uv (SMW-wrapped
            # solver); the delta-rhs gains 2/3 dt uv v_c
            fu, fvm = b["fbk"]
            rhs_d = rhs_d + jnp.asarray(2.0 / 3.0 * dt, w) * (
                fu @ (fvm @ c["v"])).astype(w)
        gp_n = g_tdp(t) + bfp_n
        sol = ops_.solver.solve(rhs_d, (gp_n - c["gp"]).astype(w))
        dv_n = sol[:ops_.nin].astype(w)
        v_n = c["v"] + dv_n.astype(c["v"].dtype)
        p_n = (-sol[ops_.nin:] / dt).astype(c["p"].dtype)
        nrm = jnp.linalg.norm(v_n)
        bad = jnp.logical_or(nrm > check_ff_maxv, jnp.isnan(nrm))
        flag = jnp.logical_or(c["flag"], bad)
        v_n = jnp.where(flag, c["v"], v_n)
        dv_n = jnp.where(flag, c["dv"], dv_n)
        p_n = jnp.where(flag, c["p"], p_n)
        mbc_pn = (jnp.where(flag, c["mbc_p"], c["mbc"])
                  if controls else 0.0)
        return dict(v=v_n, dv=dv_n, p=p_n,
                    nfc_p=nfc_c, fv=fv_n, dfv=dfv_n, drm=drm_n,
                    cvals=cvals_n, cmems=cmems, mbc=mbc_n,
                    mbc_p=mbc_pn, gp=jnp.where(flag, c["gp"], gp_n),
                    flag=flag)

    if resume_carry is None:
        carry = dict(v=bs["v"], dv=(bs["v"] - v0).astype(ops.wdtype),
                     p=bs["p"],
                     nfc_p=bs["nfc_c"].astype(ops.wdtype),
                     fv=bs["fv_n"], dfv=bs["dfv_n"], drm=bs["drm"],
                     cvals=bs["cvals"], cmems=bs["cmems"], mbc=bs["mbc"],
                     mbc_p=mbc_p0, gp=bs["gp"], flag=jnp.asarray(False))
        ts = trange[2:]
    else:
        carry = _restore_carry(resume_carry)
        ts = trange[1:]
    carry, ys, tout, _ = _run_scan(step, bundle, carry, ts, save_every)
    return dict(
        v=carry["v"], p=carry["p"], ffflag=bool(carry["flag"]),
        times=tout, vs=None if ys is None else ys[0],
        ps=None if ys is None else ys[1],
        bootstrap=bs, ops=ops, carry=carry,
    )


def semi_implicit_euler(trange=None, prob=None, inivel=None, rhs_tv=None,
                        save_every=1, inv_dtype=None, refine=None, **kw):
    """``(M + dt A) v_n + dt J^T q = M v_c + dt rhs(t, v_c)`` with one
    reused factorization (reference time_int_utils.py:566-635)."""
    trange = np.asarray(trange)
    dt = float(trange[1] - trange[0])
    ops = _build_ops(prob, dt, theta=1.0, inv_dtype=inv_dtype, refine=refine)
    cn = _consts(prob, None)
    bundle = dict(ops=ops, kern=prob.conv_kernel, cn=cn)
    if rhs_tv is None:
        fv = jnp.asarray(np.asarray(prob.fv).ravel())
        rhs_tv = lambda t, v: fv                   # noqa: E731

    fp0 = jnp.asarray(np.asarray(prob.fp).ravel())

    def step(b, c, t):
        # increment form of (M + dt A) v_n = M v_c + dt rhs:
        # (M + dt A) delta = -dt A v_c + dt rhs  (O(dt) rhs, see cnab)
        ops_ = b["ops"]
        w = ops_.wdtype
        rhs_d = jnp.asarray(dt, w) * (rhs_tv(t, c["v"]).astype(w)
                                      - ops_.A.matvec(c["v"]).astype(w))
        sol = ops_.solver.solve(rhs_d, (fp0 - c["gp"]).astype(w))
        v_n = c["v"] + sol[:ops_.nin].astype(c["v"].dtype)
        return dict(v=v_n, p=(-sol[ops_.nin:] / dt).astype(c["p"].dtype),
                    gp=fp0)

    v0 = jnp.asarray(np.asarray(inivel).ravel())
    carry = dict(v=v0, p=jnp.zeros((prob.np_cond,)),
                 gp=jnp.asarray(prob.Jc @ np.asarray(v0)))
    carry, ys, tout, _ = _run_scan(step, bundle, carry, trange[1:],
                                   save_every)
    return dict(v=carry["v"], p=carry["p"], times=tout,
                vs=None if ys is None else ys[0],
                ps=None if ys is None else ys[1], ops=ops)
