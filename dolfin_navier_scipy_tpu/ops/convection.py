"""Convection operators: the per-step hot path.

The reference re-assembles the convection terms through FEniCS at *every*
linearization point / time step (dolfin_to_sparrays.py:325-472, crossing
the Python<->C++ boundary each time; identified as the dominant per-step
cost in SURVEY.md section 3.3).  Here the same operators are computed
on device with static-shape JAX kernels:

* ``convection_vector``:  ``c[(a,i)] = int ((u2 . grad) u1)_i phi_a dx``
  matching ``dts.get_convvec(uone=u1, utwo=u2)`` (UFL ``grad(u1)*u2``),
* ``convection_matrices``: ``N1(u0) ~ (u0 . grad) u`` and
  ``N2(u0) ~ (u . grad) u0``  (dolfin_to_sparrays.py:325-376).

Host (numpy) twins are provided as correctness oracles for the tests
(the reference's scipy-vs-weak-form double bookkeeping, SURVEY.md section 4).
"""

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from .assemble import AssemblyContext


# ---------------------------------------------------------------------------
# host reference implementations (oracles)
# ---------------------------------------------------------------------------

def _u_at_quad(ctx: AssemblyContext, u_full: np.ndarray):
    """values and gradients of a velocity field at the quad points."""
    space = ctx.space
    ue = u_full.reshape(-1, 2)[space.p2_dofmap]          # (nc,6,2)
    uq = np.einsum("qa,eac->eqc", ctx.N2, ue)            # (nc,Q,2)
    guq = np.einsum("eqad,eac->eqcd", ctx.gphi2, ue)     # (nc,Q,2,2) dU_c/dx_d
    return ue, uq, guq


def convection_vector_host(ctx, u1_full, u2_full=None):
    """``int ((u2.grad)u1) . phi dx`` over the full dof set; numpy oracle."""
    space = ctx.space
    if u2_full is None:
        u2_full = u1_full
    _, u1q, gu1q = _u_at_quad(ctx, np.asarray(u1_full))
    _, u2q, _ = _u_at_quad(ctx, np.asarray(u2_full))
    conv = np.einsum("eqd,eqcd->eqc", u2q, gu1q)
    fe = np.einsum("eq,qa,eqc->eac", ctx.wdet, ctx.N2, conv)
    out = np.zeros(space.nv_full)
    np.add.at(out, space.vdofs_of_cells().ravel(), fe.ravel())
    return out.reshape(-1, 1)


def convection_matrices_host(ctx, u0_full):
    """N1, N2 (scipy CSR over full dofs) and ``fv = N(u0)u0``; numpy oracle."""
    space = ctx.space
    _, u0q, gu0q = _u_at_quad(ctx, np.asarray(u0_full))

    # N1[(a,i),(b,j)] = delta_ij int (u0 . grad phi_b) phi_a
    u0gradb = np.einsum("eqd,eqbd->eqb", u0q, ctx.gphi2)
    n1e = np.einsum("eq,qa,eqb->eab", ctx.wdet, ctx.N2, u0gradb)
    nc = n1e.shape[0]
    N1vec = np.zeros((nc, 6, 2, 6, 2))
    N1vec[:, :, 0, :, 0] = n1e
    N1vec[:, :, 1, :, 1] = n1e

    # N2[(a,i),(b,j)] = int phi_b dU0_i/dx_j phi_a
    N2vec = np.einsum("eq,qa,qb,eqij->eaibj", ctx.wdet, ctx.N2, ctx.N2, gu0q)

    from .assemble import _vec_coo

    fv = convection_vector_host(ctx, u0_full)
    return _vec_coo(space, N1vec), _vec_coo(space, N2vec), fv


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class ConvectionKernel:
    """Static-shape device kernels bound to one FEM space.

    TPU-tuned formulation: the per-quad-point interpolation/gradient
    einsums are cast as TWO large MXU matmuls with *constant* weight
    matrices (built from the reference-element tables), followed by tiny
    VPU contractions — profiled 5x (f64) to 20x (f32) faster than the
    naive per-element f64 einsums, whose small batched dots lower to
    emulated f64 MXU passes.

    Registered as a pytree: pass it *through* ``jax.jit`` as an argument —
    closing over the tables would embed them as HLO constants (breaking
    remote-compile size limits and executable caching).
    """

    def __init__(self, ctx: AssemblyContext = None, dtype=None, _leaves=None):
        if _leaves is not None:
            (self.W1, self.W2, self.W3, self.JinvT, self.wdet,
             self.nodes, self.vd, self.vdofs_flat) = _leaves
            return
        space = ctx.space
        dtype = dtype or jnp.float64
        self.nv_full = space.nv_full
        Q = ctx.N2.shape[0]
        self.Q = Q
        # W1: ue(a,c) -> u at quad points (q,c)
        W1 = np.zeros((12, 2 * Q))
        # W2: ue(a,c) -> reference-gradient components (q,k,c)
        W2 = np.zeros((12, 4 * Q))
        # W3: (wdet * conv)(q,c) -> element load (a,c)
        W3 = np.zeros((2 * Q, 12))
        for q in range(Q):
            for a in range(6):
                for c in range(2):
                    W1[2 * a + c, 2 * q + c] = ctx.N2[q, a]
                    W3[2 * q + c, 2 * a + c] = ctx.N2[q, a]
                    for k in range(2):
                        W2[2 * a + c, 4 * q + 2 * k + c] = ctx.dN2[q, a, k]
        self.W1 = jnp.asarray(W1, dtype)
        self.W2 = jnp.asarray(W2, dtype)
        self.W3 = jnp.asarray(W3, dtype)
        self.JinvT = jnp.asarray(ctx.JinvT, dtype)      # (nc,d,k)
        self.wdet = jnp.asarray(ctx.wdet, dtype)        # (nc,Q)
        self.nodes = jnp.asarray(space.p2_dofmap)       # (nc,6)
        vd = space.vdofs_of_cells()                      # (nc,6,2)
        self.vd = jnp.asarray(vd.reshape(-1, 12))
        self.vdofs_flat = jnp.asarray(vd.reshape(-1))

    def tree_flatten(self):
        return ((self.W1, self.W2, self.W3, self.JinvT, self.wdet,
                 self.nodes, self.vd, self.vdofs_flat),
                (self.nv_full, self.Q))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls(_leaves=children)
        obj.nv_full, obj.Q = aux
        return obj

    def _fields_at_quad(self, u_full, grads=True):
        """-> ``(ue (nc,12), uq (nc,Q,2), guq (nc,Q,2,2) or None)``."""
        nc = self.wdet.shape[0]
        Q = self.Q
        dt = self.W1.dtype
        ue = u_full.astype(dt)[self.vd]                          # (nc,12)
        uq = (ue @ self.W1).reshape(nc, Q, 2)                    # MXU
        if not grads:
            return ue, uq, None
        rg = (ue @ self.W2).reshape(nc, Q, 2, 2)                 # (q,k,c)
        # physical gradients: guq[e,q,c,d] = sum_k JinvT[e,d,k] rg[e,q,k,c]
        guq = jnp.einsum("edk,eqkc->eqcd", self.JinvT, rg)       # VPU
        return ue, uq, guq

    def vector(self, u1_full, u2_full=None):
        """Device ``N(u1)u2``-style vector: ``int ((u2.grad)u1).phi dx``."""
        nc = self.wdet.shape[0]
        _, u1q, gu1q = self._fields_at_quad(u1_full)
        if u2_full is None:
            u2q = u1q
        else:
            _, u2q, _ = self._fields_at_quad(u2_full, grads=False)
        conv = jnp.einsum("eqd,eqcd->eqc", u2q, gu1q)
        wconv = (self.wdet[:, :, None] * conv).reshape(nc, 2 * self.Q)
        fe = wconv @ self.W3                                     # MXU
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs_flat, num_segments=self.nv_full
        )
        return out.astype(u1_full.dtype)

    def element_matrices(self, u0_full, picard_only=False):
        """Per-element linearized convection blocks ``(nc,6,2,6,2)``.

        ``N1+N2`` by default (Newton), ``N1`` only for Picard
        (stokes_navier_utils.py:114-118).
        """
        nc = self.wdet.shape[0]
        Q = self.Q
        _, u0q, gu0q = self._fields_at_quad(u0_full)
        # reconstruct per-quad shape tables from the weight matrices
        Nq = self.W1.reshape(6, 2, Q, 2)[:, 0, :, 0].T           # (Q,6)
        dN = self.W2.reshape(6, 2, Q, 2, 2)[:, 0, :, :, 0]       # (6,Q,k)
        gphi = jnp.einsum("edk,aqk->eqad", self.JinvT, dN)
        u0gradb = jnp.einsum("eqd,eqbd->eqb", u0q, gphi)
        n1e = jnp.einsum("eq,qa,eqb->eab", self.wdet, Nq, u0gradb)
        eye = jnp.eye(2, dtype=n1e.dtype)
        out = jnp.einsum("eab,ij->eaibj", n1e, eye)
        if not picard_only:
            out = out + jnp.einsum(
                "eq,qa,qb,eqij->eaibj", self.wdet, Nq, Nq, gu0q
            )
        return out.astype(u0_full.dtype)
