"""Steady-state Navier-Stokes solver: Stokes init -> Picard -> Newton.

Re-designs the reference's ``solve_steadystate_nse``
(stokes_navier_utils.py:212-545) TPU-first:

* the linearized convection operator is assembled **on device** each
  iteration (element batch einsums + scatter into a dense condensed
  saddle matrix) instead of FEniCS re-assembly + scipy slicing,
* each iteration is one jitted ``build -> LU -> solve`` pipeline; on TPU
  (no f64 LU primitive) the factorization is f32 with f64 iterative
  refinement,
* device buffers travel through ``jax.jit`` as pytree arguments (the
  :class:`SteadySolverKernel` is a registered pytree) — closing over them
  would embed the dense saddle matrix as an HLO constant,
* the M-norm update criterion and the Picard->Newton switch match the
  reference exactly (tolerances: stokes_navier_utils.py:222-223).

The returned pressure is the physical one (the raw saddle ``q`` is
flipped, as in stokes_navier_utils.py:403,:469,:503).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class SteadySolverKernel:
    """Device pipeline bound to one condensed problem (pytree)."""

    def __init__(self, prob=None, _leaves=None, _aux=None):
        if _leaves is not None:
            (self.Kbase, self.cond_vd, self.kern, self.invinds,
             self.v_bc, self.Mc, self.fv, self.fp) = _leaves
            (self.nin, self.npp, self.ncond, self.lu_dtype,
             self.n_refine) = _aux
            return
        nin = len(prob.invinds)
        npp = prob.np_cond
        self.nin, self.npp = nin, npp
        self.ncond = nin + npp

        # full-vdof -> condensed index ([0,nin) inner, ncond = trash row)
        full2cond = np.full(prob.nv_full, self.ncond, dtype=np.int32)
        full2cond[prob.invinds] = np.arange(nin, dtype=np.int32)
        vd = prob.space.vdofs_of_cells()                # (nc,6,2)
        self.cond_vd = jnp.asarray(full2cond[vd])       # (nc,6,2)

        # dense condensed Stokes saddle matrix (+1 trash row/col)
        K = np.zeros((self.ncond + 1, self.ncond + 1))
        K[:nin, :nin] = prob.Ac.todense()
        K[:nin, nin:self.ncond] = prob.JTc.todense()
        K[nin:self.ncond, :nin] = prob.Jc.todense()
        self.Kbase = jnp.asarray(K)

        self.kern = prob.conv_kernel
        self.invinds = jnp.asarray(prob.invinds)
        self.v_bc = jnp.asarray(prob.bc_full_vec())      # bc vals, 0 inside
        self.Mc = prob.Mc_ell
        self.fv = jnp.asarray(np.asarray(prob.fv).ravel())
        self.fp = jnp.asarray(np.asarray(prob.fp).ravel())
        # TPUs have no f64 LU: factorize in f32, recover accuracy with
        # iterative refinement against the f64 matrix (kept alongside)
        on_cpu = jax.default_backend() == "cpu"
        self.lu_dtype = jnp.float64 if on_cpu else jnp.float32
        self.n_refine = 0 if on_cpu else 4

    def tree_flatten(self):
        return ((self.Kbase, self.cond_vd, self.kern, self.invinds,
                 self.v_bc, self.Mc, self.fv, self.fp),
                (self.nin, self.npp, self.ncond, self.lu_dtype,
                 self.n_refine))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    # plain methods (call inside jitted entry points below)
    def embed(self, v_inner):
        return self.v_bc.at[self.invinds].set(v_inner)

    def _rhs(self, v_full, picard):
        conbc = self.kern.vector(self.v_bc, v_full)      # (u0.grad)u_bc
        if not picard:
            conbc = conbc + self.kern.vector(v_full, self.v_bc)
        rv = self.fv - conbc[self.invinds]
        if not picard:
            rv = rv + self.kern.vector(v_full)[self.invinds]
        return rv, self.fp


# ---- jitted entry points (sk passes through as a pytree argument) --------

@partial(jax.jit, static_argnames=("picard",))
def _factorize(sk, v_full, picard=False):
    """Assemble linearized convection on device, add to the Stokes saddle
    matrix, LU-factorize (f32 + f64 matrix kept on TPU)."""
    elem = sk.kern.element_matrices(v_full, picard_only=picard)
    shp = elem.shape
    rows = jnp.broadcast_to(sk.cond_vd[:, :, :, None, None], shp)
    cols = jnp.broadcast_to(sk.cond_vd[:, None, None, :, :], shp)
    K = sk.Kbase.at[rows.ravel(), cols.ravel()].add(elem.ravel())
    K = K[: sk.ncond, : sk.ncond]
    lupiv = jax.scipy.linalg.lu_factor(K.astype(sk.lu_dtype))
    return lupiv, K


@partial(jax.jit, static_argnames=("picard",))
def _rhs(sk, v_full, picard=False):
    """fv + convection rhs + bc-folding terms on the inner dofs.

    Newton adds ``(u0.grad)u0`` (stokes_navier_utils.py:497-499); the
    Dirichlet-column folding ``-N @ u_bc`` is evaluated matrix-free via
    two-field convection vectors."""
    return sk._rhs(v_full, picard)


@jax.jit
def _solve(sk, lupiv, K, rhsv, rhsp):
    rhs = jnp.concatenate([rhsv, rhsp])
    sol = jax.scipy.linalg.lu_solve(
        lupiv, rhs.astype(sk.lu_dtype)).astype(rhs.dtype)
    for _ in range(sk.n_refine):
        r = rhs - K @ sol
        sol = sol + jax.scipy.linalg.lu_solve(
            lupiv, r.astype(sk.lu_dtype)).astype(rhs.dtype)
    return sol[: sk.nin], -sol[sk.nin:]    # flip: physical pressure


@jax.jit
def _stokes_factor(sk):
    K = sk.Kbase[: sk.ncond, : sk.ncond]
    return jax.scipy.linalg.lu_factor(K.astype(sk.lu_dtype)), K


@jax.jit
def _embed(sk, v_inner):
    return sk.embed(v_inner)


@jax.jit
def _m_norm(sk, dv):
    return jnp.sqrt(jnp.abs(dv @ sk.Mc.matvec(dv)))


def _host_steady(prob, vel_pcrd_stps, vel_pcrd_tol, vel_nwtn_stps,
                 vel_nwtn_tol, vel_start_nwtn, only_stokes, verbose, log):
    """Sparse-splu twin of the device pipeline: per iteration one host
    convection assembly + one ``splu`` of the sparse saddle (the
    reference's recipe, stokes_navier_utils.py:438-525).  This is the
    scalable path — the device kernel's dense LU is capped at ~25k rows
    on TPU and is O(n^3) on the (single-core) host."""
    import scipy.sparse as sps

    from .convconts import get_v_conv_conts
    from .sadpnt import host_saddle_factorized

    fv = np.asarray(prob.fv).ravel()
    fp = np.asarray(prob.fp).ravel()
    Mc = sps.csr_matrix(prob.Mc)
    norms = []

    def mnorm(dv):
        return float(np.sqrt(abs(dv @ (Mc @ dv))))

    if vel_start_nwtn is None or only_stokes:
        vp = host_saddle_factorized(prob.Ac, prob.Jc, prob.JTc)(fv, fp)
        v_inner = vp[: len(fv), 0]
        p = -vp[len(fv):, 0]
    else:
        v_inner = np.asarray(vel_start_nwtn).ravel()[prob.invinds]
        p = np.zeros(prob.np_cond)

    if not only_stokes:
        for k in range(vel_pcrd_stps):
            v_full = np.asarray(prob.embed(v_inner))
            convc, _, rhsv_conbc = get_v_conv_conts(
                vvec=v_full, prob=prob, Picard=True)
            vp = host_saddle_factorized(
                prob.Ac + convc, prob.Jc, prob.JTc)(
                    fv + np.asarray(rhsv_conbc).ravel(), fp)
            v_new = vp[: len(fv), 0]
            p = -vp[len(fv):, 0]
            upd = mnorm(v_new - v_inner)
            v_inner = v_new
            if verbose:
                log.info(f"Picard iteration {k + 1} -- update norm {upd:e}")
            if upd < vel_pcrd_tol:
                break
        converged = False
        for k in range(vel_nwtn_stps):
            v_full = np.asarray(prob.embed(v_inner))
            convc, rhs_con, rhsv_conbc = get_v_conv_conts(
                vvec=v_full, prob=prob, Picard=False)
            vp = host_saddle_factorized(
                prob.Ac + convc, prob.Jc, prob.JTc)(
                    fv + np.asarray(rhs_con).ravel()
                    + np.asarray(rhsv_conbc).ravel(), fp)
            v_new = vp[: len(fv), 0]
            p = -vp[len(fv):, 0]
            upd = mnorm(v_new - v_inner)
            norms.append(upd)
            v_inner = v_new
            if verbose:
                log.info(f"Newton iteration {k + 1} -- update norm {upd:e}")
            if upd < vel_nwtn_tol:
                converged = True
                break
        if vel_nwtn_stps > 0 and not converged:
            import warnings

            warnings.warn("Steady State NSE: Newton has not converged",
                          UserWarning)
    return np.asarray(prob.embed(v_inner)), p, norms


def solve_steadystate_nse(
    prob,
    vel_pcrd_stps=10,
    vel_pcrd_tol=1e-4,
    vel_nwtn_stps=20,
    vel_nwtn_tol=5e-15,
    vel_start_nwtn=None,
    only_stokes=False,
    return_vp=False,
    return_nwtnupd_norms=False,
    useolddata=False,
    clearprvdata=False,
    save_data=False,
    data_prfx="",
    N=None,
    verbose=True,
    linsolver="auto",
    **kw,
):
    """Steady NSE on a :class:`~..models.problem.NSEProblem`.

    Returns the velocity on the *full* dof set (boundary values appended,
    like the reference's ``_appbcs``, stokes_navier_utils.py:537) and,
    with ``return_vp``, the physical pressure.

    ``useolddata``/``clearprvdata``/``save_data`` reproduce the
    reference's filename-keyed velocity caching
    (stokes_navier_utils.py:308-342): converged states are stored under
    ``get_datastr`` keys and reloaded when the stored Newton-update norm
    meets the tolerance.

    ``linsolver``: ``'dense'`` (on-device dense LU per iteration, the
    TPU fast path below ~25k rows), ``'host-sparse'`` (scipy splu per
    iteration — scalable to any mesh), or ``'auto'``.
    """
    import logging

    from ..utils import io as dou

    log = logging.getLogger(__name__)

    cdatstr = dou.get_datastr(time=None, meshp=N, nu=prob.nu, Nts=None,
                              data_prfx=data_prfx)
    if clearprvdata:
        import glob as _glob
        import os as _os

        for fname in _glob.glob(cdatstr + "*__vel*"):
            _os.remove(fname)
    if useolddata:
        try:
            norm_nwtnupd = float(
                np.asarray(dou.load_npa(cdatstr + "__norm_nwtnupd")).ravel()[0])
            vel_k = dou.load_npa(cdatstr + "__vel")
            if norm_nwtnupd < vel_nwtn_tol:
                if verbose:
                    log.info(f"loaded converged velocity from {cdatstr}")
                if not return_vp:
                    return (vel_k, [norm_nwtnupd]) \
                        if return_nwtnupd_norms else vel_k
                from .pfromv import get_pfromv

                pfv = get_pfromv(v=vel_k.ravel()[prob.invinds], prob=prob)
                ret = (vel_k, pfv)
                return (ret, [norm_nwtnupd]) if return_nwtnupd_norms else ret
        except (IOError, FileNotFoundError):
            if verbose:
                log.info("no old velocity data found")

    if linsolver == "auto":
        ncond = len(prob.invinds) + prob.np_cond
        on_cpu = jax.default_backend() == "cpu"
        linsolver = ("host-sparse"
                     if (on_cpu and ncond > 6000) or ncond > 25000
                     else "dense")
    if linsolver == "host-sparse":
        vwc_np, p_np, norms = _host_steady(
            prob, vel_pcrd_stps, vel_pcrd_tol, vel_nwtn_stps,
            vel_nwtn_tol, vel_start_nwtn, only_stokes, verbose, log)
        vwc = vwc_np.reshape(-1, 1)
        if save_data:
            dou.save_npa(vwc, cdatstr + "__vel")
            dou.save_npa(np.atleast_1d(norms[-1] if norms else np.inf),
                         cdatstr + "__norm_nwtnupd")
        ret = (vwc, p_np.reshape(-1, 1)) if return_vp else vwc
        return (ret, norms) if return_nwtnupd_norms else ret

    sk = prob.steady_kernel()
    norms = []

    if vel_start_nwtn is None or only_stokes:
        lupiv, K = _stokes_factor(sk)
        v_inner, p = _solve(sk, lupiv, K, sk.fv, sk.fp)
    else:
        v_start = jnp.asarray(np.asarray(vel_start_nwtn).ravel())
        v_inner = v_start[jnp.asarray(prob.invinds)]
        p = jnp.zeros((sk.npp,))

    if not only_stokes:
        for k in range(vel_pcrd_stps):
            v_full = _embed(sk, v_inner)
            lupiv, K = _factorize(sk, v_full, picard=True)
            rhsv, rhsp = _rhs(sk, v_full, picard=True)
            v_new, p = _solve(sk, lupiv, K, rhsv, rhsp)
            upd = float(_m_norm(sk, v_new - v_inner))
            v_inner = v_new
            if verbose:
                log.info(f"Picard iteration {k + 1} -- update norm {upd:e}")
            if upd < vel_pcrd_tol:
                break

        converged = False
        for k in range(vel_nwtn_stps):
            v_full = _embed(sk, v_inner)
            lupiv, K = _factorize(sk, v_full, picard=False)
            rhsv, rhsp = _rhs(sk, v_full, picard=False)
            v_new, p = _solve(sk, lupiv, K, rhsv, rhsp)
            upd = float(_m_norm(sk, v_new - v_inner))
            norms.append(upd)
            v_inner = v_new
            if verbose:
                log.info(f"Newton iteration {k + 1} -- update norm {upd:e}")
            if upd < vel_nwtn_tol:
                converged = True
                break
        if vel_nwtn_stps > 0 and not converged:
            import warnings

            warnings.warn("Steady State NSE: Newton has not converged",
                          UserWarning)

    vwc = np.asarray(_embed(sk, v_inner)).reshape(-1, 1)
    if save_data:
        dou.save_npa(vwc, cdatstr + "__vel")
        # no Newton step ran (only_stokes / Picard-only): store inf like
        # the reference, so useolddata cannot mistake the state for a
        # converged Newton solution (0.0 would pass any tolerance)
        dou.save_npa(np.atleast_1d(norms[-1] if norms else np.inf),
                     cdatstr + "__norm_nwtnupd")
    ret = (vwc, np.asarray(p).reshape(-1, 1)) if return_vp else vwc
    if return_nwtnupd_norms:
        return ret, norms
    return ret


def solve_steadystate_pseudotime(
    prob, dt=None, tol=1e-8, chunk=400, max_rounds=60,
    inivel=None, return_vp=False, return_info=False,
    linsolver="auto", warm_refine=1, verbose=True, **kw,
):
    """Steady NSE by pseudo-time marching: run the increment-form CNAB
    scan to its fixed point.

    The increment solve ``F delta = -dt A v + dt*(AB2 conv terms)
    + dt fv`` has the steady NSE solution as its EXACT fixed point
    (``delta = 0`` iff ``A v + N(v)v = fv`` and ``J v = fp``), so the
    march inherits the time-stepper's machinery and size range — the
    banded block-Schur path runs at 100k+ dofs where the reference's
    steady solve needs a sparse LU of the *convected* saddle matrix per
    Newton step (stokes_navier_utils.py:212-545; ~hours single-core at
    the 122k-dof 3D level-1 mesh).  No factorization of the convected
    operator is ever formed; only the constant Stokes-level factors.

    Convergence is checked every ``chunk`` steps on the M-norm rate
    ``|v_new - v_old|_M / (chunk dt |v|_M) < tol`` — for stable flows
    the rate decays with the slowest physical mode.  On blow-up the
    march restarts from the last good state at ``dt/2``.

    ``dt=None`` picks ``0.25 h_min / v_ref`` (CFL-style; ``h_min`` from
    the cell Jacobians, ``v_ref`` from the boundary data).

    Returns the full-dof velocity (and with ``return_vp`` the physical
    pressure of the final step; with ``return_info`` a dict with the
    rate history).  TPU-first counterpart of the reference's
    ``solve_steadystate_nse`` for meshes beyond direct-solver sizes.
    """
    import logging

    import scipy.sparse as sps

    from .timeint import cnab

    log = logging.getLogger(__name__)
    ctx = prob.ctx
    dim = getattr(ctx, "dim", 2)
    if dt is None:
        cellvol = np.asarray(ctx.detJ) / (2.0 if dim == 2 else 6.0)
        hmin = float((2.0 * cellvol.min()) ** (1.0 / dim))
        vref = max(float(np.abs(prob.bc_full_vec()).max()), 1e-6)
        dt = 0.25 * hmin / vref
    nin = len(prob.invinds)
    v = (np.zeros(nin) if inivel is None
         else np.asarray(inivel).ravel()[:nin]
         if np.asarray(inivel).size >= nin else np.asarray(inivel).ravel())
    Mc = sps.csr_matrix(prob.Mc)

    def m_norm(x):
        return float(np.sqrt(abs(x @ (Mc @ x))))

    ops = None
    p = None
    rates = []
    converged = False
    for rnd in range(max_rounds):
        out = cnab(trange=np.linspace(0.0, chunk * dt, chunk + 1),
                   prob=prob, inivel=v, inip=p, ops=ops,
                   linsolver=linsolver, warm_refine=warm_refine,
                   save_every=None, **kw)
        if out["ffflag"]:
            dt *= 0.5
            ops = None
            log.warning(f"pseudotime blow-up; restarting at dt={dt:g}")
            if verbose:
                print(f"pseudotime: blow-up, dt -> {dt:g}", flush=True)
            continue
        ops = out["ops"]
        v_new = np.asarray(out["v"], np.float64)
        p = np.asarray(out["p"], np.float64)
        vn = m_norm(v_new) or 1.0
        rate = m_norm(v_new - v) / (chunk * dt * vn)
        rates.append(rate)
        v = v_new
        if verbose:
            print(f"pseudotime round {rnd + 1}: t+={chunk * dt:g} "
                  f"rate={rate:.3e}", flush=True)
        if rate < tol:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(f"pseudotime: rate {rates[-1]:.2e} after "
                      f"{max_rounds} rounds (tol {tol:g})", UserWarning)
    # column-vector convention like solve_steadystate_nse (the
    # reference returns (n, 1) vectors throughout)
    vwc = np.asarray(prob.embed(v)).reshape(-1, 1)
    info = dict(rates=rates, dt=dt, rounds=len(rates),
                converged=converged)
    ret = (vwc, p.reshape(-1, 1)) if return_vp else vwc
    if return_info:
        return ret, info
    return ret
