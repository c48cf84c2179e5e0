"""Saddle-point solvers: the replacement for the reference's external
``sadptprj_riclyap_adi.lin_alg_utils`` ("lau") package.

Solves

    [[A, J^T], [J, 0]] [v; q] = [rhs_v; rhs_p]

with optional low-rank update ``A -> A - umat @ vmat`` applied via
Sherman-Morrison-Woodbury (matching ``lau.solve_sadpnt_smw``; the
feedback hooks in stokes_navier_utils.py:1505-1512 rely on this).

Backends
--------
* ``dense``  — on-device dense LU (``jax.scipy.linalg.lu_factor``); for the
  reference's benchmark sizes (NV+NP ~ 3k-10k dofs) one factorization is
  cheap and the per-step triangular solves ride the MXU.  The factorization
  is reusable across time steps — the property that makes the reference's
  CNAB loop fast (time_int_utils.py:89-91, one ``spsla.factorized`` reused).
* ``host``  — scipy SuperLU twin, used as the correctness oracle and as the
  performance baseline in ``bench.py``.

Sign convention: the raw saddle solution ``q`` relates to the physical
pressure as ``p = -q`` (the reference flips it too:
stokes_navier_utils.py:403).  These low-level routines return the *raw*
``[v; q]``; high-level solvers flip.
"""

from functools import partial

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spsla

import jax
import jax.numpy as jnp


def _to_dense(mat):
    if sps.issparse(mat):
        return np.asarray(mat.todense())
    return np.asarray(mat)


class SaddleSolver:
    """Reusable on-device factorization of one saddle matrix.

    On TPU (no f64 LU primitive) the factorization is f32 and solves are
    refined against the f64 matrix (iterative refinement); on CPU the
    LU is straight f64.
    """

    def __init__(self, amat, jmat, jmatT=None, dtype=None):
        dtype = dtype or jnp.float64
        nv = amat.shape[0]
        npp = jmat.shape[0]
        jT = jmat.T if jmatT is None else jmatT
        K = np.zeros((nv + npp, nv + npp))
        K[:nv, :nv] = _to_dense(amat)
        K[:nv, nv:] = _to_dense(jT)
        K[nv:, :nv] = _to_dense(jmat)
        self.nv, self.np = nv, npp
        on_cpu = jax.default_backend() == "cpu"
        self.lu_dtype = dtype if on_cpu else jnp.float32
        self.n_refine = 0 if (on_cpu or dtype != jnp.float64) else 4
        self.K = jnp.asarray(K, dtype) if self.n_refine else None
        self.lu, self.piv = jax.scipy.linalg.lu_factor(
            jnp.asarray(K, self.lu_dtype))
        self.dtype = dtype

    def _backsolve(self, B):
        """LU backsolve with iterative refinement; B is (n,) or (n,k)."""
        X = jax.scipy.linalg.lu_solve(
            (self.lu, self.piv), B.astype(self.lu_dtype)
        ).astype(B.dtype)
        for _ in range(self.n_refine):
            R = B - self.K @ X
            X = X + jax.scipy.linalg.lu_solve(
                (self.lu, self.piv), R.astype(self.lu_dtype)
            ).astype(B.dtype)
        return X

    @partial(jax.jit, static_argnums=0)
    def solve(self, rhsv, rhsp):
        """Solve for stacked ``[v; q] (nv+np,)``; jit/scan-safe."""
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        return self._backsolve(rhs)

    @partial(jax.jit, static_argnums=0)
    def solve_smw(self, rhsv, rhsp, umat, vmat):
        """Solve with the rank-k update ``A -> A - umat @ vmat``.

        SMW around the base factorization:
        ``x = x0 + W (I - V W)^{-1} V x0`` with ``W = K^{-1} U_hat``.
        """
        x0 = self.solve(rhsv, rhsp)
        k = umat.shape[1]
        uhat = jnp.vstack([umat, jnp.zeros((self.np, k), dtype=umat.dtype)])
        W = self._backsolve(uhat)
        vhat = jnp.hstack([vmat, jnp.zeros((vmat.shape[0], self.np),
                                           dtype=vmat.dtype)])
        small = jnp.eye(k, dtype=umat.dtype) - vhat @ W
        coef = jnp.linalg.solve(small, vhat @ x0)
        return x0 + W @ coef


def solve_sadpnt(amat=None, jmat=None, jmatT=None, rhsv=None, rhsp=None,
                 umat=None, vmat=None, return_solver=False,
                 krylov=None, krpslvprms=None, krplsprms=None):
    """Functional one-shot API mirroring ``lau.solve_sadpnt_smw``.

    Returns the stacked raw solution ``(nv+np, 1)`` (numpy); with
    ``return_solver=True`` also the reusable :class:`SaddleSolver`.
    ``krylov='gmres'`` routes to the Krylov path with the reference's
    ``krpslvprms`` kwargs bag (tol/maxiter/x0/convstatsl).
    """
    if krylov:
        from .krylov import solve_sadpnt_krylov

        if umat is not None:
            raise NotImplementedError("SMW updates with the Krylov path")
        x, _ = solve_sadpnt_krylov(amat=amat, jmat=jmat, jmatT=jmatT,
                                   rhsv=rhsv, rhsp=rhsp,
                                   krpslvprms=krpslvprms)
        return x
    solver = SaddleSolver(amat, jmat, jmatT)
    if rhsp is None:
        rhsp = jnp.zeros((solver.np,))
    if umat is not None:
        out = solver.solve_smw(jnp.asarray(rhsv), jnp.asarray(rhsp),
                               jnp.asarray(_to_dense(umat)),
                               jnp.asarray(_to_dense(vmat)))
    else:
        out = solver.solve(jnp.asarray(rhsv), jnp.asarray(rhsp))
    out = np.asarray(out).reshape(-1, 1)
    if return_solver:
        return out, solver
    return out


@jax.tree_util.register_pytree_node_class
class InverseSaddleSolver:
    """TPU-native reusable saddle solver: explicit inverse on the MXU plus
    float64 iterative refinement with *sparse* residuals.

    Registered as a pytree: pass it INTO jitted functions rather than
    closing over it — the dense inverse must become an HLO parameter,
    not an embedded constant.

    TPUs have no f64 LU/triangular-solve primitives, and the reference's
    one-LU-many-backsolves pattern (time_int_utils.py:89-91) maps poorly
    onto a systolic array.  Instead:

    * setup (host, one-time): factorize ``K = [[A, J^T],[J, 0]]`` in f64
      and form ``K^{-1}``; ship it to device in ``inv_dtype`` (f32 on TPU).
    * per solve (device): ``x0 = Kinv @ rhs`` — a single MXU matmul — then
      ``refine`` rounds of ``x += Kinv @ (rhs - K x)`` with the residual
      computed from the *sparse* ELL operators in f64 (cheap VPU work),
      recovering f64 accuracy from the f32 inverse.
    """

    def __init__(self, amat=None, jmat=None, jmatT=None, refine=None,
                 inv_dtype=None, dtype=None, res_ops=None,
                 _leaves=None, _aux=None):
        import scipy.linalg as spla

        from ..ops.sparse import ell_from_scipy_fast

        if _leaves is not None:
            (self.Kinv, self.A_ell, self.J_ell, self.JT_ell,
             self.res_ops, self.KinvT) = _leaves
            (self.nv, self.np, self.refine, self.inv_dtype,
             self.dtype, self.use_pallas, self.n_pad) = _aux
            return

        # optional element-level (Kop, Jop) pair for the refinement
        # residual — ~17x faster than the ELL matvecs on TPU
        self.res_ops = res_ops
        dtype = dtype or jnp.float64
        nv, npp = amat.shape[0], jmat.shape[0]
        self.nv, self.np = nv, npp
        jT = jmat.T if jmatT is None else jmatT

        K = np.zeros((nv + npp, nv + npp))
        K[:nv, :nv] = _to_dense(amat)
        K[:nv, nv:] = _to_dense(jT)
        K[nv:, :nv] = _to_dense(jmat)
        # One-time host inversion (f64, threaded LAPACK when jax's CPU
        # backend is reachable).  NOTE: computing the inverse on the TPU
        # in f32 looked attractive (seconds vs minutes) but made the
        # subsequent Kinv matvecs ~8x slower (value-dependent; measured
        # 487 vs 3937 steps/s) — do not resurrect without profiling.
        n_all = nv + npp
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                Kinv = np.asarray(jnp.linalg.inv(jnp.asarray(K)))
        except Exception:
            lu, piv = spla.lu_factor(K)
            Kinv = spla.lu_solve((lu, piv), np.eye(n_all))

        if inv_dtype is None:
            on_tpu = jax.default_backend() not in ("cpu",)
            inv_dtype = jnp.float32 if on_tpu else dtype
        self.inv_dtype = inv_dtype
        # Pallas inverse-apply: 1.5x the XLA dense matvec on v5e (531 vs
        # 346 GB/s measured); opt-in via DNS_TPU_PALLAS=1, f32-on-TPU only
        import os

        self.use_pallas = (os.environ.get("DNS_TPU_PALLAS", "0") == "1"
                           and inv_dtype == jnp.float32
                           and jax.default_backend() not in ("cpu",))
        if self.use_pallas:
            npad = ((nv + npp + 1023) // 1024) * 1024
            KinvTp = np.zeros((npad, npad), np.float32)
            KinvTp[: nv + npp, : nv + npp] = Kinv.T
            self.KinvT = jnp.asarray(KinvTp)
            self.n_pad = npad
        else:
            self.KinvT = None
            self.n_pad = 0
        # cast on host before the device transfer (avoids staging the full
        # f64 inverse in HBM: 2x memory spike at large sizes)
        self.Kinv = jnp.asarray(np.asarray(Kinv, dtype=inv_dtype))
        if refine is None:
            refine = 3 if inv_dtype == jnp.float32 else 0
        self.refine = refine
        self.dtype = dtype
        # sparse twins, for residual refinement and matrix-free callers
        self.A_ell = ell_from_scipy_fast(amat, dtype=dtype)
        self.J_ell = ell_from_scipy_fast(jmat, dtype=dtype)
        self.JT_ell = ell_from_scipy_fast(jT, dtype=dtype)

    def tree_flatten(self):
        return ((self.Kinv, self.A_ell, self.J_ell, self.JT_ell,
                 self.res_ops, self.KinvT),
                (self.nv, self.np, self.refine, self.inv_dtype, self.dtype,
                 self.use_pallas, self.n_pad))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def _apply_inv(self, r):
        """``Kinv @ r`` in ``inv_dtype`` (Pallas fast path when enabled)."""
        if self.use_pallas:
            from ..ops.pallas_kernels import vecmat_pallas

            n = self.nv + self.np
            rp = jnp.zeros((self.n_pad,), jnp.float32)
            rp = rp.at[:n].set(r.astype(jnp.float32))
            return vecmat_pallas(rp, self.KinvT)[:n]
        return self.Kinv @ r.astype(self.inv_dtype)

    def _K_matvec(self, x):
        v, q = x[: self.nv], x[self.nv:]
        if self.res_ops is not None:
            Kop, Jop = self.res_ops
            rv = Kop.matvec(v) + Jop.rmatvec(q)
            rp = Jop.matvec(v)
        else:
            rv = self.A_ell.matvec(v) + self.JT_ell.matvec(q)
            rp = self.J_ell.matvec(v)
        return jnp.concatenate([rv, rp])

    def solve(self, rhsv, rhsp):
        """Plain (non-jitted) method: call from within jitted code that
        received this solver as a pytree argument."""
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        x = self._apply_inv(rhs).astype(self.dtype)
        for _ in range(self.refine):
            r = rhs - self._K_matvec(x)
            x = x + self._apply_inv(r).astype(self.dtype)
        return x


def apply_massinv(massmat, rhsa, output=None):
    """``M^{-1} rhs`` — parity with ``lau.apply_massinv``
    (used e.g. in tests/time_dep_nse_bigchannel.py:33)."""
    rhs = np.asarray(_to_dense(rhsa))
    out = spsla.spsolve(sps.csc_matrix(massmat), rhs)
    return np.asarray(out).reshape(rhs.shape)


# ---------------------------------------------------------------------------
# host oracle / baseline
# ---------------------------------------------------------------------------

def host_saddle_factorized(amat, jmat, jmatT=None):
    """scipy ``splu``-backed reusable solver (baseline twin of the
    reference's ``spsla.factorized`` pattern, time_int_utils.py:89-91)."""
    nv = amat.shape[0]
    npp = jmat.shape[0]
    jT = jmat.T if jmatT is None else jmatT
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(amat), sps.csc_matrix(jT)]),
        sps.hstack([sps.csc_matrix(jmat), sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)

    def solve(rhsv, rhsp=None):
        if rhsp is None:
            rhsp = np.zeros((npp,))
        rhs = np.concatenate([np.asarray(rhsv).ravel(),
                              np.asarray(rhsp).ravel()])
        return lu.solve(rhs).reshape(-1, 1)

    return solve


def solve_sadpnt_host(amat=None, jmat=None, jmatT=None, rhsv=None, rhsp=None,
                      umat=None, vmat=None):
    """One-shot host solve; SMW handled by explicit dense correction."""
    solve = host_saddle_factorized(amat, jmat, jmatT)
    x0 = solve(rhsv, rhsp)
    if umat is None:
        return x0
    nv, npp = amat.shape[0], jmat.shape[0]
    k = umat.shape[1]
    uh = np.vstack([_to_dense(umat), np.zeros((npp, k))])
    W = np.hstack([solve(uh[: nv, i], uh[nv:, i]) for i in range(k)])
    vh = np.hstack([_to_dense(vmat), np.zeros((vmat.shape[0], npp))])
    coef = np.linalg.solve(np.eye(k) - vh @ W, vh @ x0)
    return x0 + W @ coef
