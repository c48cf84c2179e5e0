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


import jax
import jax.numpy as jnp

from .assemble import AssemblyContext


# ---------------------------------------------------------------------------
# host reference implementations (oracles)
# ---------------------------------------------------------------------------

def _u_at_quad(ctx: AssemblyContext, u_full: np.ndarray):
    """values and gradients of a velocity field at the quad points."""
    space = ctx.space
    dim = getattr(ctx, "dim", 2)
    ue = u_full.reshape(-1, dim)[space.p2_dofmap]        # (nc,n,dim)
    uq = np.einsum("qa,eac->eqc", ctx.N2, ue)            # (nc,Q,dim)
    guq = np.einsum("eqad,eac->eqcd", ctx.gphi2, ue)     # dU_c/dx_d
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
    nc, nvpc = n1e.shape[0], n1e.shape[1]
    dim = getattr(ctx, "dim", 2)
    N1vec = np.zeros((nc, nvpc, dim, nvpc, dim))
    for c in range(dim):
        N1vec[:, :, c, :, c] = n1e

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
            (self.W1blk, self.W2blk, self.W2Tblk, self.W3blk, self.Nq,
             self.dNq, self.JinvT, self.wdet, self.nodes, self.vd,
             self.vdofs_flat) = _leaves
            return
        space = ctx.space
        dtype = dtype or jnp.float64
        self.nv_full = space.nv_full
        Q = ctx.N2.shape[0]
        nvpc = ctx.N2.shape[1]
        dim = getattr(ctx, "dim", 2)
        self.dim = dim
        nd = dim * nvpc
        self.Q = Q
        self.nvpc = nvpc
        # W1: ue(a,c) -> u at quad points (q,c)
        W1 = np.zeros((nd, dim * Q))
        # W2: ue(a,c) -> reference-gradient components (q,k,c)
        W2 = np.zeros((nd, dim * dim * Q))
        # W3: (wdet * conv)(q,c) -> element load (a,c)
        W3 = np.zeros((dim * Q, nd))
        for q in range(Q):
            for a in range(nvpc):
                for c in range(dim):
                    W1[dim * a + c, dim * q + c] = ctx.N2[q, a]
                    W3[dim * q + c, dim * a + c] = ctx.N2[q, a]
                    for k in range(dim):
                        W2[dim * a + c,
                           dim * dim * q + dim * k + c] = ctx.dN2[q, a, k]

        nc = ctx.wdet.shape[0]
        # blocking pays off only for emulated-f64 matmuls (see affine.py)
        blk = max(1, 128 // nd) if dtype == jnp.float64 else 1
        self.blk = blk
        self.nc_real = nc
        nc_pad = ((nc + blk - 1) // blk) * blk
        self.nc = nc_pad

        def kronblk(W):
            return jnp.asarray(np.kron(np.eye(blk), W), dtype)

        def pad(arr, fill=0):
            p = nc_pad - arr.shape[0]
            if p == 0:
                return arr
            return np.concatenate(
                [arr, np.full((p,) + arr.shape[1:], fill, arr.dtype)], 0)

        self.W1blk = kronblk(W1)
        self.W2blk = kronblk(W2)
        self.W2Tblk = kronblk(W2.T)
        self.W3blk = kronblk(W3)
        self.Nq = jnp.asarray(ctx.N2, dtype)                 # (Q,nvpc)
        self.dNq = jnp.asarray(ctx.dN2, dtype)               # (Q,nvpc,2)
        self.JinvT = jnp.asarray(pad(ctx.JinvT), dtype)      # (nc,d,k)
        self.wdet = jnp.asarray(pad(ctx.wdet), dtype)        # (nc,Q)
        self.nodes = jnp.asarray(pad(space.p2_dofmap, 0))    # (nc,nvpc)
        vd = space.vdofs_of_cells().reshape(-1, nd)          # (nc,nd)
        # padding scatters to the extra segment nv_full (dropped)
        self.vd = jnp.asarray(pad(vd, fill=space.nv_full))
        self.vdofs_flat = self.vd.reshape(-1)

    def tree_flatten(self):
        return ((self.W1blk, self.W2blk, self.W2Tblk, self.W3blk, self.Nq,
                 self.dNq, self.JinvT, self.wdet, self.nodes, self.vd,
                 self.vdofs_flat),
                (self.nv_full, self.Q, self.nvpc, self.blk, self.nc,
                 self.nc_real, self.dim))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls(_leaves=children)
        (obj.nv_full, obj.Q, obj.nvpc, obj.blk, obj.nc,
         obj.nc_real, obj.dim) = aux
        return obj

    def with_dof_map(self, dofmap):
        """Clone with the element velocity-dof tables re-indexed.

        ``dofmap (nv_full+1,) int32``: old full dof id -> new position
        (the permuted state layout; slot ``nv_full`` stays the dropped
        padding segment).  Gathers and the scatter then read/write the
        permuted state directly — no per-step translation."""
        leaves, aux = self.tree_flatten()
        new = self.tree_unflatten(aux, leaves)
        new.vd = dofmap[jnp.minimum(self.vd, self.nv_full)]
        new.vdofs_flat = new.vd.reshape(-1)
        return new

    def with_element_order(self, eorder):
        """Clone with the elements permuted (``eorder (nc,)``: new row k
        is old row ``eorder[k]``).  Dof ids are unchanged — only the
        per-element tables (geometry, weights, dof lists) move.  Used by
        the banded convection tail, which needs elements sorted along
        the RCM state order so its gather/scatter matrices are banded
        (:mod:`.banded_conv`)."""
        leaves, aux = self.tree_flatten()
        new = self.tree_unflatten(aux, leaves)
        eo = jnp.asarray(np.asarray(eorder))
        new.JinvT = self.JinvT[eo]
        new.wdet = self.wdet[eo]
        new.nodes = self.nodes[eo]
        new.vd = self.vd[eo]
        new.vdofs_flat = new.vd.reshape(-1)
        return new

    def _bmm(self, X, Wblk, out_dim):
        Xb = X.reshape(self.nc // self.blk, -1)
        return (Xb @ Wblk).reshape(self.nc, out_dim)

    def _fields_at_quad(self, u_full, grads=True):
        """-> ``(ue (nc,nd), uq (nc,Q,2), guq (nc,Q,2,2) or None)``."""
        Q = self.Q
        dt = self.wdet.dtype
        dim = self.dim
        upad = jnp.concatenate([u_full.astype(dt),
                                jnp.zeros((1,), dt)])
        ue = upad[jnp.minimum(self.vd, self.nv_full)]        # (nc,nd)
        uq = self._bmm(ue, self.W1blk, dim * Q).reshape(self.nc, Q, dim)
        if not grads:
            return ue, uq, None
        rg = self._bmm(ue, self.W2blk,
                       dim * dim * Q).reshape(self.nc, Q, dim, dim)
        guq = jnp.einsum("edk,eqkc->eqcd", self.JinvT, rg)
        return ue, uq, guq

    def vector(self, u1_full, u2_full=None):
        """Device ``N(u1)u2``-style vector: ``int ((u2.grad)u1).phi dx``."""
        _, u1q, gu1q = self._fields_at_quad(u1_full)
        if u2_full is None:
            u2q = u1q
        else:
            _, u2q, _ = self._fields_at_quad(u2_full, grads=False)
        conv = jnp.einsum("eqd,eqcd->eqc", u2q, gu1q)
        wconv = (self.wdet[:, :, None]
                 * conv).reshape(self.nc, self.dim * self.Q)
        fe = self._bmm(wconv, self.W3blk, self.dim * self.nvpc)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs_flat,
            num_segments=self.nv_full + 1
        )
        return out[: self.nv_full].astype(u1_full.dtype)

    def vector_and_amatvec(self, u_full, nu, sym=True,
                           fac_elem=None, fac_vdofs=None):
        """Fused ``(N(u)u, A u)`` over the FULL dof vector in ONE element
        pipeline: the convection quadrature already interpolates the
        gradients the stiffness needs, so both share the gather and the
        (stacked) scatter — one segment_sum, per the axon scheduling
        lesson that a second separate scatter costs far more than its
        flops.  ``fac_elem/fac_vdofs``: optional facet-correction blocks
        (outflow/Robin terms folded into A, full-dof ids).

        Returns ``(conv (nv_full,), av (nv_full,))``.
        """
        dt = self.wdet.dtype
        _, uq, guq = self._fields_at_quad(u_full)
        # convection load
        conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
        wconv = (self.wdet[:, :, None]
                 * conv).reshape(self.nc, self.dim * self.Q)
        fe_c = self._bmm(wconv, self.W3blk, self.dim * self.nvpc)
        # stiffness load: F = nu (grad u (+ grad u^T)), pulled back
        F = guq + jnp.swapaxes(guq, 2, 3) if sym else guq
        G = jnp.einsum("edk,eqcd->eqkc", self.JinvT, F)
        G = (jnp.asarray(nu, dt) * self.wdet[:, :, None, None]
             * G).reshape(self.nc, self.dim * self.dim * self.Q)
        fe_a = self._bmm(G, self.W2Tblk, self.dim * self.nvpc)

        off = self.nv_full + 1
        vals = [fe_c.reshape(-1), fe_a.reshape(-1)]
        ids = [self.vdofs_flat,
               jnp.minimum(self.vdofs_flat, self.nv_full) + off]
        if fac_elem is not None and fac_elem.shape[0]:
            xfe = jnp.concatenate(
                [u_full.astype(dt), jnp.zeros((1,), dt)])[fac_vdofs]
            ffe = jnp.einsum("fab,fb->fa", fac_elem.astype(dt), xfe)
            vals.append(ffe.reshape(-1))
            ids.append(jnp.minimum(fac_vdofs.reshape(-1), self.nv_full)
                       + off)
        out = jax.ops.segment_sum(
            jnp.concatenate(vals), jnp.concatenate(ids),
            num_segments=2 * off)
        return (out[: self.nv_full].astype(u_full.dtype),
                out[off: off + self.nv_full].astype(u_full.dtype))

    def element_matrices(self, u0_full, picard_only=False,
                         unpadded_nc=None):
        """Per-element linearized convection blocks ``(nc,n,2,n,2)``
        over the *unpadded* element count (``unpadded_nc`` trims the
        blocking pad; pass the mesh cell count, else padded rows with
        zero weights are returned too — they carry zero entries).

        ``N1+N2`` by default (Newton), ``N1`` only for Picard
        (stokes_navier_utils.py:114-118).
        """
        _, u0q, gu0q = self._fields_at_quad(u0_full)
        gphi = jnp.einsum("edk,qak->eqad", self.JinvT, self.dNq)
        u0gradb = jnp.einsum("eqd,eqbd->eqb", u0q, gphi)
        n1e = jnp.einsum("eq,qa,eqb->eab", self.wdet, self.Nq, u0gradb)
        eye = jnp.eye(self.dim, dtype=n1e.dtype)
        out = jnp.einsum("eab,ij->eaibj", n1e, eye)
        if not picard_only:
            out = out + jnp.einsum(
                "eq,qa,qb,eqij->eaibj", self.wdet, self.Nq, self.Nq, gu0q
            )
        out = out[: (unpadded_nc or self.nc_real)]
        return out.astype(u0_full.dtype)
