"""Krylov saddle-point solves.

Parity with the reference's optional krypy-GMRES path
(``lau.solve_sadpnt_smw(krylov='gmres', krpslvprms=..., krplsprms=...)``,
solve_nse docstring stokes_navier_utils.py:651-664) plus a jittable
device GMRES for scan bodies.  ``KrylovCounter`` mirrors
``SpslaKrylovCounter`` (residual-callback statistics,
stokes_navier_utils.py:724,:861-874).
"""

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spsla

import jax



class KrylovCounter:
    """Residual-callback counter for scipy Krylov solvers."""

    def __init__(self, store=None):
        self.niter = 0
        self.resnorms = []
        self.store = store

    def __call__(self, res):
        self.niter += 1
        r = float(np.linalg.norm(res)) if np.ndim(res) else float(res)
        self.resnorms.append(r)
        if self.store is not None:
            self.store.append(r)


def solve_sadpnt_krylov(amat=None, jmat=None, jmatT=None, rhsv=None,
                        rhsp=None, umat=None, vmat=None,
                        krpslvprms=None, krplsprms=None, precond=None):
    """Host GMRES on the saddle system with optional preconditioner.

    ``krpslvprms`` keys (matching the reference's kwargs bag):
    ``tol``, ``maxiter``, ``x0``, ``restart``, ``convstatsl`` (a list that
    collects per-iteration residual norms).  ``krplsprms`` carries
    linear-*system* side parameters the reference forwards to krypy
    (stokes_navier_utils.py:661, :1511): the supported key is ``Ml`` — a
    left preconditioner ((nv+np,) vector -> vector callable, sparse
    matrix, or ``LinearOperator``); it takes precedence over ``precond``.
    The low-rank feedback update ``A -> A - umat @ vmat`` enters the
    Krylov operator directly — no Sherman-Morrison bookkeeping needed on
    the iterative path (the reference's lau supports this combination for
    the closed-loop runs, solve_nse docstring
    stokes_navier_utils.py:651-664 + :1505-1512).
    """
    p = dict(krpslvprms or {})
    lp = dict(krplsprms or {})
    if "Ml" in lp and lp["Ml"] is not None:
        Ml = lp["Ml"]
        if callable(Ml) and not isinstance(Ml, spsla.LinearOperator):
            n = amat.shape[0] + jmat.shape[0]
            precond = spsla.LinearOperator((n, n), matvec=Ml)
        else:
            precond = spsla.aslinearoperator(Ml)
    nv = amat.shape[0]
    npp = jmat.shape[0]
    jT = jmat.T if jmatT is None else jmatT
    K = sps.vstack([
        sps.hstack([sps.csr_matrix(amat), sps.csr_matrix(jT)]),
        sps.hstack([sps.csr_matrix(jmat), sps.csr_matrix((npp, npp))]),
    ]).tocsr()
    if rhsp is None:
        rhsp = np.zeros((npp,))
    b = np.concatenate([np.asarray(rhsv).ravel(), np.asarray(rhsp).ravel()])
    counter = KrylovCounter(store=p.get("convstatsl"))
    if umat is not None:
        U = np.asarray(umat.todense() if sps.issparse(umat) else umat)
        V = np.asarray(vmat.todense() if sps.issparse(vmat) else vmat)

        def upd_matvec(x):
            y = K @ x
            y[:nv] -= U @ (V @ x[:nv])
            return y

        Kop = spsla.LinearOperator(K.shape, matvec=upd_matvec)
    else:
        Kop = K
    x, info = spsla.gmres(
        Kop, b, x0=p.get("x0"),
        rtol=p.get("tol", 1e-10), atol=0.0,
        restart=p.get("restart", 150),
        maxiter=p.get("maxiter", 200),
        M=precond, callback=counter, callback_type="pr_norm",
    )
    if info != 0:
        import warnings

        warnings.warn(f"gmres: info={info} (not converged)")
    return x.reshape(-1, 1), counter


def device_pgmres(matvec, b, precond, x0=None, tol=1e-12, restart=20,
                  maxiter=3):
    """Jittable right-preconditioned GMRES (scan-safe) — thin wrapper
    over ``jax.scipy.sparse.linalg.gmres``."""
    x, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b, x0=b * 0 if x0 is None else x0, M=precond,
        tol=tol, atol=0.0, restart=restart, maxiter=maxiter,
        solve_method="batched")
    return x


def device_fgmres(matvec, precond, b, restart=30, cycles=3, x0=None):
    """Jittable FLEXIBLE GMRES (FGMRES, right-preconditioned).

    The preconditioner may be a NONLINEAR map — e.g. an inner Jacobi-PCG
    velocity solve, whose effective operator depends on its input.
    Plain GMRES (jax.scipy.sparse.linalg.gmres) assumes a FIXED
    preconditioning operator; feeding it a PCG-based preconditioner
    silently breaks the Arnoldi recurrence (measured on the steady
    saddle: residual stalls at ~0.2 of the rhs regardless of iteration
    count).  FGMRES stores the preconditioned basis ``Z_j = M(v_j)``
    explicitly and forms the update from it, which is exactly the
    classical fix (Saad 1993).

    jit/scan-safe: static restart length and cycle count, masked
    classical Gram-Schmidt inside a ``fori_loop`` (the column index is
    dynamic, so orthogonalization uses a full (m+1)-row product with an
    index mask).  Memory: ``(2 m + 1) n`` work vectors.

    Returns the approximate solution of ``matvec(x) = b`` from ``x0``
    (default 0).  ``x0`` lets callers run one restart cycle per jitted
    dispatch and thread the iterate on the host — the tunneled TPU
    runtime kills dispatches past ~60 s wall ("TPU worker process
    crashed"), so large-n many-cycle solves must be split.
    """
    import jax.numpy as jnp
    import jax.scipy.linalg as jsla
    from jax import lax

    m = int(restart)
    n = b.shape[0]
    dt_ = b.dtype
    tiny = jnp.asarray(1e-30, dt_)
    iota = jnp.arange(m + 1)

    def cycle(x, _):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dt_).at[0].set(r / (beta + tiny))
        Z = jnp.zeros((m, n), dt_)
        H = jnp.zeros((m + 1, m), dt_)

        def arnoldi(j, st):
            V, Z, H = st
            z = precond(V[j])
            w = matvec(z)
            h = jnp.where(iota <= j, V @ w, 0.0)
            w = w - h @ V
            nw = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / (nw + tiny))
            H = H.at[:, j].set(h + nw * (iota == j + 1))
            return V, Z.at[j].set(z), H

        V, Z, H = lax.fori_loop(0, m, arnoldi, (V, Z, H))
        e1 = jnp.zeros((m + 1,), dt_).at[0].set(beta)
        # small least-squares via regularized normal equations — the
        # TPU remote compiler SIGABRTs on lstsq's SVD path (observed
        # "Check failed: buffer != nullptr"), and at m ~ 20-40 the
        # squared condition number is harmless next to the f32 Arnoldi.
        # The ridge is RELATIVE to H's scale: an absolute one NaNs the
        # f32 Cholesky when a cycle (near-)converges and H collapses
        # toward zero (observed at lvl3), and the final isfinite guard
        # turns any breakdown into "no update" instead of poison
        G = H.T @ H
        reg = (jnp.asarray(1e-6, dt_) * jnp.trace(G) / m + tiny)
        y = jsla.solve(G + reg * jnp.eye(m, dtype=dt_), H.T @ e1,
                       assume_a="pos")
        y = jnp.where(jnp.isfinite(y), y, jnp.zeros_like(y))
        return x + y @ Z, None

    xstart = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)
    x, _ = lax.scan(cycle, xstart, None, length=int(cycles))
    return x
