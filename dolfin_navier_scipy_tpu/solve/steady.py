"""Steady-state Navier-Stokes solver: Stokes init -> Picard -> Newton.

Re-designs the reference's ``solve_steadystate_nse``
(stokes_navier_utils.py:212-545) TPU-first:

* the linearized convection operator is assembled **on device** each
  iteration (element batch einsums + scatter into a dense condensed
  saddle matrix) instead of FEniCS re-assembly + scipy slicing,
* each iteration is one jitted ``build -> LU -> solve`` pipeline,
* the M-norm update criterion and the Picard->Newton switch match the
  reference exactly (tolerances: stokes_navier_utils.py:222-223).

The returned pressure is the physical one (the raw saddle ``q`` is
flipped, as in stokes_navier_utils.py:403,:469,:503).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


class SteadySolverKernel:
    """Device pipeline bound to one condensed problem."""

    def __init__(self, prob):
        self.prob = prob
        nin = len(prob.invinds)
        npp = prob.np_cond
        self.nin, self.npp = nin, npp
        self.ncond = nin + npp
        kern = prob.conv_kernel

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

        self.kern = kern
        self.invinds = jnp.asarray(prob.invinds)
        self.v_bc = jnp.asarray(prob.bc_full_vec())      # bc vals, 0 inside
        self.Mc = prob.Mc_ell
        self.fv = jnp.asarray(prob.fv.ravel())
        self.fp = jnp.asarray(prob.fp.ravel())

    def embed(self, v_inner):
        full = self.v_bc
        return full.at[self.invinds].set(v_inner)

    @partial(jax.jit, static_argnames=("self", "picard"))
    def factorize(self, v_full, picard=False):
        """Assemble linearized convection on device, add to the Stokes
        saddle matrix, LU-factorize."""
        elem = self.kern.element_matrices(v_full, picard_only=picard)
        shp = elem.shape
        rows = jnp.broadcast_to(self.cond_vd[:, :, :, None, None], shp)
        cols = jnp.broadcast_to(self.cond_vd[:, None, None, :, :], shp)
        K = self.Kbase.at[rows.ravel(), cols.ravel()].add(elem.ravel())
        return jax.scipy.linalg.lu_factor(K[: self.ncond, : self.ncond])

    @partial(jax.jit, static_argnames=("self", "picard"))
    def rhs(self, v_full, picard=False):
        """fv + convection rhs + bc-folding terms, on the inner dofs.

        Newton: ``+ (u0.grad)u0`` (stokes_navier_utils.py:497-499); the
        Dirichlet-column folding ``-N @ u_bc`` is evaluated matrix-free
        via two-field convection vectors.
        """
        conbc = self.kern.vector(self.v_bc, v_full)      # (u0.grad)u_bc
        if not picard:
            conbc = conbc + self.kern.vector(v_full, self.v_bc)
        rv = self.fv - conbc[self.invinds]
        if not picard:
            rv = rv + self.kern.vector(v_full)[self.invinds]
        return rv, self.fp

    @partial(jax.jit, static_argnames=("self",))
    def solve(self, lupiv, rhsv, rhsp):
        sol = jax.scipy.linalg.lu_solve(
            lupiv, jnp.concatenate([rhsv, rhsp])
        )
        return sol[: self.nin], -sol[self.nin:]   # flip: physical pressure

    @partial(jax.jit, static_argnames=("self",))
    def m_norm(self, dv):
        return jnp.sqrt(jnp.abs(dv @ self.Mc.matvec(dv)))

    def stokes_lupiv(self):
        return jax.scipy.linalg.lu_factor(
            self.Kbase[: self.ncond, : self.ncond]
        )


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
    verbose=True,
    **kw,
):
    """Steady NSE on a :class:`~..models.problem.NSEProblem`.

    Returns the velocity on the *full* dof set (boundary values appended,
    like the reference's ``_appbcs``, stokes_navier_utils.py:537) and,
    with ``return_vp``, the physical pressure.
    """
    import logging

    log = logging.getLogger(__name__)
    sk = prob.steady_kernel()
    norms = []

    if vel_start_nwtn is None or only_stokes:
        lupiv = sk.stokes_lupiv()
        v_inner, p = sk.solve(lupiv, sk.fv, sk.fp)
    else:
        v_start = jnp.asarray(np.asarray(vel_start_nwtn).ravel())
        v_inner = v_start[sk.invinds]
        p = jnp.zeros((sk.npp,))

    if not only_stokes:
        for k in range(vel_pcrd_stps):
            v_full = sk.embed(v_inner)
            lupiv = sk.factorize(v_full, picard=True)
            rhsv, rhsp = sk.rhs(v_full, picard=True)
            v_new, p = sk.solve(lupiv, rhsv, rhsp)
            upd = float(sk.m_norm(v_new - v_inner))
            v_inner = v_new
            if verbose:
                log.info(f"Picard iteration {k + 1} -- update norm {upd:e}")
            if upd < vel_pcrd_tol:
                break

        converged = False
        for k in range(vel_nwtn_stps):
            v_full = sk.embed(v_inner)
            lupiv = sk.factorize(v_full, picard=False)
            rhsv, rhsp = sk.rhs(v_full, picard=False)
            v_new, p = sk.solve(lupiv, rhsv, rhsp)
            upd = float(sk.m_norm(v_new - v_inner))
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

    vwc = np.asarray(sk.embed(v_inner)).reshape(-1, 1)
    ret = (vwc, np.asarray(p).reshape(-1, 1)) if return_vp else vwc
    if return_nwtnupd_norms:
        return ret, norms
    return ret
