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


# ---------------------------------------------------------------------------
# Device-native steady solve at every mesh size (linsolver='krylov').
#
# The dense-LU kernel above is capped at ~25k rows (TPU VMEM); the
# reference's answer past that is a fresh sparse LU per Picard/Newton
# iteration (stokes_navier_utils.py:438-525 + splu) — single-core hours
# at 3D sizes.  The TPU-native answer: each linearized saddle
#
#     [[A + N(v_lin), J^T], [J, 0]] [v; q] = [rhs_v; rhs_p]
#
# is solved matrix-free by f32 FLEXIBLE GMRES (the preconditioner
# nests iterative solves — plain GMRES's Arnoldi breaks on such
# nonlinear maps, solve/krylov.device_fgmres) with a block-triangular
# preconditioner that includes the CONVECTION (a Stokes-only
# preconditioner stalls: N ~ Re*h * A dominates A at benchmark
# Reynolds numbers — measured residual floor ~0.2 at Re=40):
#
# * velocity block: fixed-count Jacobi-GMRES on F = A + N itself
#   (element-matrix matvecs, nonsymmetric-safe),
# * pressure block: the LSC (least-squares commutator) Schur
#   approximation  S^-1 ~ L^-1 (J D_M^-1 F D_M^-1 J^T) L^-1 with
#   L = J D_M^-1 J^T applied via Jacobi-PCG — measured 1.4 orders of
#   outer-residual contraction per 20-iteration FGMRES cycle at Re=40
#   where SIMPLE (J diag(F)^-1 J^T) stalls outright,
#
# wrapped in f64 iterative refinement against the exact f64 operator
# (affine element matvecs + two-field convection vectors) — TPUs have
# no f64 factorization, but refinement recovers the f64 fixed point to
# ~1e-12 relative residual.  Everything is matrix-free (no
# factorization of the convected operator, no dense n^2 or np^2
# objects), so the path runs at any mesh size the element pipeline
# fits.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class SteadyKrylovKernel:
    """Per-problem device state for the matrix-free steady solve."""

    _leaf_names = ("aff32", "aff64", "kern32", "kern64", "ell_dofs",
                   "invinds", "v_bc64", "fv64", "fp64", "dMi",
                   "dinv", "dinv_l", "Linv")
    _aux_names = ("nin", "npp", "nv_full", "f_iters", "f_cycles",
                  "l_iters")

    def __init__(self, prob=None, f_iters=None, l_iters=None,
                 _leaves=None, _aux=None):
        if _leaves is not None:
            for n, v in zip(self._leaf_names, _leaves):
                setattr(self, n, v)
            for n, v in zip(self._aux_names, _aux):
                setattr(self, n, v)
            return
        import os as _os

        import scipy.sparse as sps

        nin = len(prob.invinds)
        self.nin, self.npp = nin, prob.np_cond
        self.nv_full = prob.nv_full
        self.aff32 = prob.affine_ops(jnp.float32)
        self.aff64 = prob.affine_ops(jnp.float64)
        self.kern32 = prob.conv_kernel_f32
        self.kern64 = prob.conv_kernel
        nd = prob.ctx.dim * prob.ctx.N2.shape[1]
        full2in = np.full(prob.nv_full, nin, dtype=np.int32)
        full2in[prob.invinds] = np.arange(nin, dtype=np.int32)
        vd = prob.space.vdofs_of_cells().reshape(-1, nd)
        self.ell_dofs = jnp.asarray(full2in[vd])
        self.invinds = jnp.asarray(prob.invinds)
        self.v_bc64 = jnp.asarray(prob.bc_full_vec())
        self.fv64 = jnp.asarray(np.asarray(prob.fv).ravel())
        self.fp64 = jnp.asarray(np.asarray(prob.fp).ravel())
        # LSC scalings: D_M^-1 (velocity mass diag) and the Jacobi
        # diagonals of F ~ diag(A) (N's diagonal is near zero) and of
        # L = J D_M^-1 J^T (exact row formula, no assembly)
        dM = np.asarray(sps.csr_matrix(prob.Mc).diagonal()).ravel()
        self.dMi = jnp.asarray(1.0 / dM, jnp.float32)
        da = np.asarray(sps.csr_matrix(prob.Ac).diagonal()).ravel()
        self.dinv = jnp.asarray(1.0 / da, jnp.float32)
        Jc = sps.csr_matrix(prob.Jc)
        dL = np.asarray(Jc.multiply(Jc) @ (1.0 / dM)).ravel()[: self.npp]
        self.dinv_l = jnp.asarray(
            1.0 / np.where(dL > 0, dL, 1.0), jnp.float32)
        # the LSC scaling matrix L = J D_M^-1 J^T is FIXED per problem,
        # and its solve quality bounds the Schur block: a weak PCG
        # L-solve floors the whole outer iteration at lvl3+ (measured
        # ~0.34 relative residual regardless of rounds).  Invest setup
        # in an exact-ish dense inverse where it fits (np x np; device
        # f32 build past the host-O(np^3) comfort zone, within the
        # ~16k device-LU ceiling); PCG stays as the fallback beyond.
        dense_cap = int(_os.environ.get("DNS_TPU_STEADY_LINV_MAX",
                                        "16000"))
        self.Linv = None
        if self.npp <= dense_cap:
            L = (Jc @ sps.diags(1.0 / dM)
                 @ sps.csr_matrix(prob.JTc)).tocsr()[: self.npp,
                                                     : self.npp]
            on_cpu = jax.default_backend() == "cpu"
            if on_cpu or self.npp <= 2500:
                Li = np.linalg.inv(np.asarray(L.todense())
                                   + 1e-14 * np.eye(self.npp))
                self.Linv = jnp.asarray(Li, jnp.float32)
            else:
                # blocked device build (recursive Schur blocks keep
                # each LU under the VMEM ceiling; a flat 13k-row LU
                # aborts); the (hi, lo) double-f32 pair rides one
                # stacked matmul in _sk_lsolve
                from .sadpnt import _device_dense_inverse

                hi, lo = _device_dense_inverse(
                    np.asarray(L.todense(), np.float32))
                self.Linv = jnp.concatenate([hi, lo], axis=0)
        # velocity-block effort scales ~sqrt(nin), but the FGMRES basis
        # length is CAPPED at 56: basis sizes >= ~80 at n ~ 100k
        # reliably CRASH the tunneled TPU worker ("TPU worker process
        # crashed or restarted", reproduced at m=80 and m=110; m=56
        # runs) — extra effort goes into sequential restart CYCLES,
        # which reuse the same buffers
        nin_scaled = max(20, int(0.35 * np.sqrt(nin)))
        self.f_iters = (f_iters if f_iters is not None
                        else int(_os.environ.get(
                            "DNS_TPU_STEADY_F_ITERS",
                            str(min(56, nin_scaled)))))
        self.f_cycles = int(_os.environ.get(
            "DNS_TPU_STEADY_F_CYCLES",
            str(max(1, -(-nin_scaled // 56)))))
        self.l_iters = (l_iters if l_iters is not None
                        else int(_os.environ.get(
                            "DNS_TPU_STEADY_L_ITERS", "25")))

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._leaf_names),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)


@partial(jax.jit, static_argnames=("picard",))
def _sk_elem32(sk, v_lin_full, picard):
    """f32 linearized-convection element matrices ``(nc, nd, nd)``."""
    elem = sk.kern32.element_matrices(
        v_lin_full.astype(jnp.float32), picard_only=picard)
    nd = elem.shape[1] * elem.shape[2]
    return elem.reshape(-1, nd, nd)


def _sk_nmv(sk, elem, x_inner):
    """``N(v_lin) @ x`` on inner dofs from element matrices."""
    xpad = jnp.concatenate([x_inner,
                            jnp.zeros((1,), x_inner.dtype)])
    xe = xpad[sk.ell_dofs]
    fe = jnp.einsum("eab,eb->ea", elem, xe)
    out = jax.ops.segment_sum(fe.reshape(-1), sk.ell_dofs.reshape(-1),
                              num_segments=sk.nin + 1)
    return out[: sk.nin]


def _sk_fmv(sk, elem, v):
    """f32 ``F @ v = (A + N(v_lin)) @ v`` on inner dofs."""
    return sk.aff32.a_matvec(v) + _sk_nmv(sk, elem, v)


def _sk_lsolve(sk, rp):
    """Solve with the LSC scaling matrix ``L = J D_M^-1 J^T``: dense
    precomputed inverse where it fits (one MXU matvec — exactness here
    is what keeps the outer iteration mesh-robust), Jacobi-PCG through
    the affine J/J^T pipelines beyond the cap."""
    if sk.Linv is not None:
        y = sk.Linv @ rp
        if sk.Linv.shape[0] == 2 * sk.npp:     # device (hi, lo) pair
            return y[: sk.npp] + y[sk.npp:]
        return y
    from .sadpnt import jacobi_pcg

    def lmv(q):
        return sk.aff32.j_matvec(sk.dMi * sk.aff32.jt_matvec(q))

    return jacobi_pcg(lmv, sk.dinv_l, rp, sk.l_iters)


def _sk_precond(sk, elem, r):
    """Block-triangular preconditioner (f32) for the linearized saddle.

    Pressure block: LSC (least-squares commutator) Schur approximation
    ``S^-1 ~ L^-1 (J D_M^-1 F D_M^-1 J^T) L^-1`` — unlike the
    diag-based SIMPLE form it tracks the convection in F, which is the
    difference between outer convergence and an outright stall at
    benchmark Reynolds numbers (module-head measurements).  Velocity
    block: one fixed-length Jacobi-GMRES cycle on F itself
    (nonsymmetric-safe).  Both blocks are nonlinear maps — the caller
    must be FLEXIBLE GMRES."""
    from .krylov import device_fgmres

    rv, rp = r[: sk.nin], r[sk.nin:]
    q1 = _sk_lsolve(sk, rp)
    t = sk.aff32.j_matvec(
        sk.dMi * _sk_fmv(sk, elem, sk.dMi * sk.aff32.jt_matvec(q1)))
    q = -_sk_lsolve(sk, t)
    z = rv - sk.aff32.jt_matvec(q)
    v = device_fgmres(lambda u: _sk_fmv(sk, elem, u),
                      lambda u: sk.dinv * u, z,
                      restart=sk.f_iters, cycles=sk.f_cycles)
    return jnp.concatenate([v, q])


@partial(jax.jit, static_argnames=("restart", "maxiter"))
def _sk_gmres(sk, elem, r, restart=20, maxiter=1, x0=None):
    """f32 FGMRES on the linearized saddle, preconditioned by
    :func:`_sk_precond`.  FLEXIBLE because the preconditioner nests
    iterative solves — nonlinear maps that break plain GMRES's Arnoldi
    recurrence (see :func:`.krylov.device_fgmres`).  ``r`` is assumed
    O(1) (the refinement loop normalizes — f32 denormal stalls on TPU
    otherwise)."""
    from .krylov import device_fgmres

    r32 = r.astype(jnp.float32)

    def matvec(x):
        v, q = x[: sk.nin], x[sk.nin:]
        rv = _sk_fmv(sk, elem, v) + sk.aff32.jt_matvec(q)
        rp = sk.aff32.j_matvec(v)
        return jnp.concatenate([rv, rp])

    return device_fgmres(matvec, lambda y: _sk_precond(sk, elem, y),
                         r32, restart=restart, cycles=maxiter, x0=x0)


@partial(jax.jit, static_argnames=("picard",))
def _sk_residual64(sk, v_lin_full, x, rhsv, rhsp, picard):
    """f64 residual of the linearized saddle at ``x`` — the exact
    operator via affine matvecs + two-field convection vectors
    (``N1(u0)x = (u0.grad)x = vector(x, u0)``,
    ``N2(u0)x = (x.grad)u0 = vector(u0, x)``)."""
    v, q = x[: sk.nin], x[sk.nin:]
    xfull = jnp.zeros((sk.nv_full,),
                      jnp.float64).at[sk.invinds].set(v)
    nx = sk.kern64.vector(xfull, v_lin_full)
    if not picard:
        nx = nx + sk.kern64.vector(v_lin_full, xfull)
    rv = rhsv - (sk.aff64.a_matvec(v) + nx[sk.invinds]
                 + sk.aff64.jt_matvec(q))
    rp = rhsp - sk.aff64.j_matvec(v)
    return jnp.concatenate([rv, rp])


@partial(jax.jit, static_argnames=("picard",))
def _sk_rhs64(sk, v_lin_full, picard):
    """f64 rhs at a linearization point: body force + Dirichlet-column
    folding (``-N @ u_bc``, matrix-free) + the Newton ``(u0.grad)u0``
    term (stokes_navier_utils.py:491-499)."""
    conbc = sk.kern64.vector(sk.v_bc64, v_lin_full)
    if not picard:
        conbc = conbc + sk.kern64.vector(v_lin_full, sk.v_bc64)
    rv = sk.fv64 - conbc[sk.invinds]
    if not picard:
        rv = rv + sk.kern64.vector(v_lin_full)[sk.invinds]
    return rv, sk.fp64


def _sk_linsolve(sk, v_lin_full, picard, x0=None, rtol=1e-11,
                 max_rounds=8, restart=20, maxiter=3):
    """One linearized saddle solve: f32 GMRES rounds inside f64
    iterative refinement.  Returns ``(x (f64 device), rel_res)``."""
    elem = _sk_elem32(sk, v_lin_full, picard)
    rhsv, rhsp = _sk_rhs64(sk, v_lin_full, picard)
    rhs = jnp.concatenate([rhsv, rhsp])
    bn = float(jnp.linalg.norm(rhs))
    if bn == 0.0:
        return jnp.zeros_like(rhs), 0.0
    x = (jnp.zeros_like(rhs) if x0 is None
         else jnp.asarray(x0, jnp.float64))
    rn = np.inf
    for _ in range(max_rounds):
        r = _sk_residual64(sk, v_lin_full, x, rhsv, rhsp, picard)
        rn_new = float(jnp.linalg.norm(r))
        if rn_new <= rtol * bn:
            return x, rn_new / bn
        if rn_new >= 0.7 * rn:      # refinement stalled (f32 floor)
            return x, rn_new / bn
        rn = rn_new
        # ONE restart cycle per jitted dispatch, iterate threaded on
        # the host: the tunneled runtime kills ~60 s dispatches (see
        # device_fgmres), and a full lvl3 multi-cycle call is past that
        dx = None
        for _ in range(maxiter):
            dx = _sk_gmres(sk, elem, r / rn, restart=restart,
                           maxiter=1, x0=dx)
        x = x + rn * dx.astype(jnp.float64)
    r = _sk_residual64(sk, v_lin_full, x, rhsv, rhsp, picard)
    return x, float(jnp.linalg.norm(r)) / bn


def _krylov_steady(prob, vel_pcrd_stps, vel_pcrd_tol, vel_nwtn_stps,
                   vel_nwtn_tol, vel_start_nwtn, only_stokes, verbose,
                   log, lin_rtol=1e-11):
    """Device twin of :func:`_host_steady` at any mesh size: the same
    Stokes-init -> Picard -> Newton outer loop
    (stokes_navier_utils.py:438-525), each linearized solve via
    :func:`_sk_linsolve`.  Successive solves warm-start from the
    previous iterate.

    Large meshes (> ``DNS_TPU_STEADY_PT_MIN`` inner dofs, default 60k)
    first run the device pseudo-time march to a near-steady state —
    the banded CNAB scan covers thousands of steps per minute where
    one tight lvl3 FGMRES solve costs minutes — then a couple of
    Newton-krylov steps polish to the update tolerance.  The Newton
    corrections from the marched state are tiny, so moderate linear
    tolerances already give ~1e-10 absolute update accuracy."""
    import os as _os

    import scipy.sparse as sps

    sk = None
    Mc = sps.csr_matrix(prob.Mc)
    norms = []

    pt_min = int(_os.environ.get("DNS_TPU_STEADY_PT_MIN", "60000"))
    if (vel_start_nwtn is None and not only_stokes
            and len(prob.invinds) > pt_min):
        if verbose:
            log.info("steady krylov: pseudo-time init "
                     f"({len(prob.invinds)} inner dofs > {pt_min})")
        # run the march in the W-less banded config unless the caller
        # asked for W via the env knob: the truncated-inverse BUILD at
        # lvl3 shapes aborts the TPU client on some tunneled runtimes
        # (docs/PERF_NOTES.md section 18) and the abort poisons every
        # later dispatch in the process; the PCG-on-banded-F config
        # marches at ~half speed but builds safely.  Passed as an
        # explicit argument (not an os.environ mutation, which would
        # race with concurrent solver builds in this process).
        winv = (None if _os.environ.get("DNS_TPU_WINV") is not None
                else False)
        vel_start_nwtn = solve_steadystate_pseudotime(
            prob, tol=1e-7, winv=winv, verbose=verbose)
        vel_pcrd_stps = 0

    sk = SteadyKrylovKernel(prob)

    def mnorm(dv):
        return float(np.sqrt(abs(dv @ (Mc @ dv))))

    if vel_start_nwtn is None or only_stokes:
        # Stokes init: N(0) = 0, so the zero linearization point gives
        # exactly [[A, J^T],[J,0]] [v;q] = [fv; fp]
        zero_full = jnp.zeros((sk.nv_full,), jnp.float64)
        x, rres = _sk_linsolve(sk, zero_full, True, rtol=lin_rtol)
        v_inner = np.asarray(x[: sk.nin])
        p = -np.asarray(x[sk.nin:])
        if verbose:
            log.info(f"Stokes solve -- rel residual {rres:e}")
    else:
        v_inner = np.asarray(vel_start_nwtn).ravel()[prob.invinds]
        p = np.zeros(prob.np_cond)
        x = jnp.concatenate([jnp.asarray(v_inner),
                             jnp.zeros((sk.npp,))])

    if not only_stokes:
        for k in range(vel_pcrd_stps):
            v_full = jnp.asarray(np.asarray(prob.embed(v_inner)))
            x, rres = _sk_linsolve(sk, v_full, True, x0=x,
                                   rtol=lin_rtol)
            v_new = np.asarray(x[: sk.nin])
            p = -np.asarray(x[sk.nin:])
            upd = mnorm(v_new - v_inner)
            v_inner = v_new
            if verbose:
                log.info(f"Picard iteration {k + 1} -- update norm "
                         f"{upd:e} (lin res {rres:.1e})")
            if upd < vel_pcrd_tol:
                break
        converged = False
        for k in range(vel_nwtn_stps):
            v_full = jnp.asarray(np.asarray(prob.embed(v_inner)))
            x, rres = _sk_linsolve(sk, v_full, False, x0=x,
                                   rtol=lin_rtol)
            v_new = np.asarray(x[: sk.nin])
            p = -np.asarray(x[sk.nin:])
            upd = mnorm(v_new - v_inner)
            norms.append(upd)
            v_inner = v_new
            if verbose:
                log.info(f"Newton iteration {k + 1} -- update norm "
                         f"{upd:e} (lin res {rres:.1e})")
            if upd < vel_nwtn_tol:
                converged = True
                break
        if vel_nwtn_stps > 0 and not converged:
            import warnings

            warnings.warn("Steady State NSE: Newton has not converged",
                          UserWarning)
    return np.asarray(prob.embed(v_inner)), np.asarray(p), norms


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
    TPU fast path below ~25k rows), ``'krylov'`` (matrix-free device
    GMRES + banded-Stokes preconditioner inside f64 refinement — the
    device path at any mesh size), ``'host-sparse'`` (scipy splu per
    iteration, the reference's recipe), or ``'auto'`` (dense below the
    VMEM ceiling, krylov above).
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
        # past the dense-LU ceiling the DEVICE path is the default on
        # accelerators (VERDICT r3 #2): host splu remains an explicit
        # opt-in there.  On the CPU backend scipy's f64 splu is faster
        # and more robust than the f32 FGMRES machinery at EVERY size
        # above the dense window, so 'auto' keeps resolving to
        # host-sparse; 'krylov' on CPU is an explicit choice (the tests
        # exercise it that way).
        if ncond <= 25000 and not (on_cpu and ncond > 6000):
            linsolver = "dense"
        elif on_cpu:
            linsolver = "host-sparse"
        else:
            linsolver = "krylov"
    if linsolver in ("host-sparse", "krylov"):
        steady_impl = (_host_steady if linsolver == "host-sparse"
                       else _krylov_steady)
        vwc_np, p_np, norms = steady_impl(
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
    linsolver="auto", warm_refine=1, winv=None, verbose=True, **kw,
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
                   winv=winv, save_every=None, **kw)
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
