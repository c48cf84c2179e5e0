"""Differentiable time integration: the discrete adjoint for free.

The CNAB scan is pure JAX (gathers, contractions, one dense/Schur
solve per step), so ``jax.grad`` through it yields the *exact discrete
adjoint* of the integrator — gradients of any trajectory functional
with respect to the initial state and a per-step control schedule.
The reference has no adjoint capability at all (its solvers are
scipy/dolfin black boxes; gradients there would require hand-deriving
and hand-coding the adjoint PDE, cf. stokes_navier_utils.py's
forward-only loops) — this module is a TPU/JAX-native capability
beyond the reference's surface.

Design notes (TPU):

* the step is wrapped in ``jax.checkpoint`` (rematerialization), so
  reverse-mode stores only the O(nf) carries per step instead of every
  intermediate of the element pipeline — memory O(n_steps * nf)
  instead of O(n_steps * n_elements * quad);
* the factorized saddle inverse ``Zp`` is constant in time and state
  (the implicit coefficient is ``M + theta dt A``), so differentiating
  through ``Zp @ rhs`` is exact — no implicit-function machinery
  needed;
* kernels run in the work dtype (f32 on TPU), the carry in f64: the
  gradient inherits the increment-form accuracy model (f32-relative
  error on O(dt) step maps, f64 accumulation).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def make_diff_cnab(prob, dt, bvec=None, theta=0.5, precision="accurate",
                   remat=True):
    """Differentiable CNAB simulator for gradient-based control/design.

    Parameters
    ----------
    prob : problem object (as for :func:`~..solve.timeint.cnab`)
    dt : time step
    bvec : optional actuation vector over the FULL velocity dof set
        (``(nv_full,)``); the per-step forcing is ``fv + amps[i] *
        bvec``.  Pass e.g. a Robin control column (``prob.Brob``), a
        body-force load, or any assembled rhs direction.
    remat : wrap the step in ``jax.checkpoint`` (default True).

    Returns
    -------
    sim : ``sim(v0, amps) -> v_inner (nin,)`` — the final inner
        velocity after ``len(amps)`` CNAB steps from inner state
        ``v0``, differentiable in both arguments (reverse and forward
        mode).  ``amps`` may be ``None``-like (pass zeros) when only
        initial-state gradients are wanted.

    Example
    -------
    >>> sim = make_diff_cnab(prob, dt, bvec=b)
    >>> cost = lambda amps: 0.5 * jnp.sum(sim(v0, amps) ** 2)
    >>> g = jax.grad(cost)(jnp.zeros(100))      # exact discrete adjoint
    """
    from .timeint import _build_ops, _kern, build_full_layout

    ops = _build_ops(prob, dt, theta=theta, precision=precision,
                     linsolver="dense", layout="full")
    fl = build_full_layout(prob, dt, ops)
    kern = _kern(prob, "fast")
    nf, npp = fl["nf"], fl["npp"]
    w = ops.wdtype
    cdtype = jnp.float32 if precision == "fast" else jnp.float64
    nu, sym = fl["nu"], fl["sym"]
    iv = jnp.asarray(prob.invinds)
    vbc = jnp.asarray(prob.bc_full_vec(), cdtype)
    import scipy.sparse as sps

    Jc = sps.csr_matrix(prob.Jc)
    bundle = dict(aff=fl["aff"], Zp=fl["Zp"], fv=fl["fv"], kern=kern,
                  fp=jnp.asarray(np.asarray(prob.fp).ravel(), w),
                  bvec=(None if bvec is None
                        else jnp.asarray(np.asarray(bvec).ravel(), w)))
    # condensed J (over inner dofs) for the carried gp = Jc v0 —
    # differentiable w.r.t. v0, so dense (np, nin) on device
    Jin = jnp.asarray(Jc.todense(), w)

    def step(b, carry, amp):
        vf, nfc_o, gp = carry
        cv, av = b["kern"].vector_and_amatvec(
            vf, nu, sym=sym,
            fac_elem=b["aff"].fac_elem, fac_vdofs=b["aff"].fac_vdofs)
        nfc_c = (-cv).astype(w)
        fv_t = b["fv"]
        if b["bvec"] is not None:
            fv_t = fv_t + amp.astype(w) * b["bvec"]
        rhs = (jnp.asarray(-dt, w) * av.astype(w)
               + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
               + jnp.asarray(dt, w) * fv_t)
        rp = (b["fp"] - gp).astype(w)
        sol = b["Zp"] @ jnp.concatenate([rhs, rp])
        return (vf + sol[:nf].astype(vf.dtype), nfc_c, b["fp"]), None

    if remat:
        step = jax.checkpoint(step)

    def sim(v0, amps):
        v0 = jnp.asarray(v0, cdtype)
        vf0 = vbc.at[iv].set(v0)
        gp0 = Jin @ v0.astype(w)
        nfc0 = (-kern.vector(vf0)).astype(w)
        amps = jnp.asarray(amps)
        (vf, _, _), _ = lax.scan(lambda c, a: step(bundle, c, a),
                                 (vf0, nfc0, gp0), amps)
        return vf[iv]

    return sim
