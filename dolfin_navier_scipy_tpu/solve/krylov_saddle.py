"""Matrix-free Krylov saddle solver for large meshes.

The dense-inverse solver is O(n^2) memory (3.5 GB at 30k dofs) and its
host factorization is O(n^3) — beyond ~30k dofs the Krylov path is the
only one that scales.  For the time-step saddle

    [[M + theta dt A, J^T], [J, 0]]

the system is mass-dominated at CFL-scale dt, so a cheap block-diagonal
preconditioner works:

* velocity block: Jacobi with ``diag(M + theta dt A)``,
* pressure block: the pressure mass matrix scaled by ``1/(theta dt)``
  (the classical Cahouet-Chabard/PCD limit for small dt: the Schur
  complement ``J (M + theta dt A)^{-1} J^T ~ (1/(theta dt)) L_p^{-1}``-
  ...-ish; the MP-diagonal captures its scale).

All per-iteration work is the affine-factorized matvecs — f32-friendly
and independent of problem size in memory.
"""

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class KrylovSaddleSolver:
    """GMRES on the saddle with block-diagonal preconditioning.

    Drop-in for :class:`InverseSaddleSolver.solve` (same signature);
    pytree-registered for scan bodies.
    """

    _aux_names = ("nv", "np", "tol", "restart", "maxiter", "dtype")
    _leaf_names = ("Kop", "Jop", "dinv_v", "Sinv")

    def __init__(self, coeff=None, jmat=None, aff=None, theta_dt=None,
                 mp=None, tol=1e-8, restart=20, maxiter=4, dtype=None,
                 _leaves=None, _aux=None):
        if _leaves is not None:
            (self.Kop, self.Jop, self.dinv_v, self.Sinv) = _leaves
            (self.nv, self.np, self.tol, self.restart, self.maxiter,
             self.dtype) = _aux
            return
        dtype = dtype or jnp.float64
        self.dtype = dtype
        self.tol = tol
        self.restart = restart
        self.maxiter = maxiter
        self.nv = coeff.shape[0]
        self.np = jmat.shape[0]
        self.Kop = aff.view("ma", cm=1.0, ca=theta_dt)
        self.Jop = aff.view("j")
        dv = np.asarray(sps.csr_matrix(coeff).diagonal())
        self.dinv_v = jnp.asarray(1.0 / dv, dtype)
        # SIMPLE-type Schur approximation: Shat = J diag(K)^-1 J^T is an
        # exact sparse product; the pressure space is small (np << nv),
        # so its dense inverse is cheap to form and to apply (MXU matvec)
        J = sps.csr_matrix(jmat)
        Shat = (J @ sps.diags(1.0 / dv) @ J.T).todense()
        # enclosed flows: Shat is singular up to the constant mode unless
        # the pressure is pinned; regularize with the mass scale
        mpd = np.asarray(sps.csr_matrix(mp).diagonal())[: self.np]
        Shat = np.asarray(Shat) + 1e-12 * np.diag(mpd)
        self.Sinv = jnp.asarray(np.linalg.inv(Shat), dtype)

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._leaf_names),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def _matvec(self, x):
        v, q = x[: self.nv], x[self.nv:]
        rv = self.Kop.matvec(v) + self.Jop.rmatvec(q)
        rp = self.Jop.matvec(v)
        return jnp.concatenate([rv, rp])

    def _precond(self, x):
        """Block upper-triangular SIMPLE preconditioner:
        ``y_p = -Sinv x_p;  y_v = Dv^{-1} (x_v - J^T y_p)``."""
        y_p = -(self.Sinv @ x[self.nv:])
        y_v = self.dinv_v * (x[: self.nv] - self.Jop.rmatvec(y_p))
        return jnp.concatenate([y_v, y_p])

    def solve(self, rhsv, rhsp, x0=None):
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        x, _ = jax.scipy.sparse.linalg.gmres(
            self._matvec, rhs,
            x0=jnp.zeros_like(rhs) if x0 is None else x0,
            M=self._precond,
            tol=self.tol, atol=0.0,
            restart=self.restart, maxiter=self.maxiter,
            solve_method="batched")
        return x

    def residual(self, rhsv, rhsp, x):
        """Relative true residual ``|b - K x| / |b|`` of a returned
        solution — jit/scan-safe (one extra matvec), the in-scan
        convergence telemetry the fixed ``maxiter`` otherwise hides."""
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        r = rhs - self._matvec(x)
        return jnp.linalg.norm(r) / jnp.linalg.norm(rhs)

    def solve_res(self, rhsv, rhsp, x0=None):
        """``(x, relres)`` — solve plus the true-residual telemetry."""
        x = self.solve(rhsv, rhsp, x0=x0)
        return x, self.residual(rhsv, rhsp, x)


def build_krylov_ops(prob, dt, theta=0.5, tol=1e-8, restart=20, maxiter=4,
                     dtype=None):
    """TimeIntOps-compatible bundle with the Krylov saddle solver
    (for meshes beyond the dense-inverse range)."""
    from .timeint import TimeIntOps

    aff = prob.affine_ops(dtype)
    coeff = sps.csr_matrix(prob.Mc + theta * dt * prob.Ac)
    solver = KrylovSaddleSolver(coeff=coeff, jmat=prob.Jc, aff=aff,
                                theta_dt=theta * dt, mp=prob.MP,
                                tol=tol, restart=restart, maxiter=maxiter,
                                dtype=dtype)
    return TimeIntOps(solver=solver, M=aff.view("m"), A=aff.view("a"),
                      E=aff.view("ma", cm=1.0, ca=-theta * dt),
                      dt=dt, theta=theta)
