"""Affine-geometry-factorized operator application — the speed-of-light
formulation for P2/P1 operators on straight triangles.

On affine elements every FEM operator factorizes as
``sum_r geo_r[e] * (constant reference matrix)``: applying M/A/J/J^T
reduces to a few LARGE constant-weight matmuls (MXU) plus tiny per-element
2x2 geometry contractions (VPU) around one gather and one scatter.  No
per-element operator tensors are stored at all; batched small f64 dots
(which lower to slow emulated MXU passes) never appear.

The same per-quad-point gradient pipeline as the convection kernel is
reused: ``D[e,q,c,d] = d x_c / d x_d`` via ``xe @ W2`` then a JinvT
contraction; fluxes are pulled back and contracted with ``W2^T``.

Dirichlet condensation is realized by index masking exactly as in
:mod:`.elementop` (trash row + zero-padded columns).
"""

import numpy as np

import jax
import jax.numpy as jnp


def _volume_a_elements(ctx, nu, gradvsymmtrc=True):
    """Volume part of the stiffness element tensors (nc,12,12) — used to
    split the assembled element tensors into volume + facet corrections."""
    nc = ctx.wdet.shape[0]
    K1 = np.einsum("eq,eqad,eqbd->eab", ctx.wdet, ctx.gphi2, ctx.gphi2)
    Avec = np.zeros((nc, 6, 2, 6, 2))
    Avec[:, :, 0, :, 0] += K1
    Avec[:, :, 1, :, 1] += K1
    if gradvsymmtrc:
        Avec += np.einsum("eq,eqbi,eqaj->eaibj", ctx.wdet, ctx.gphi2,
                          ctx.gphi2)
    return nu * Avec.reshape(nc, 12, 12)


@jax.tree_util.register_pytree_node_class
class AffineVectorOps:
    """Fused device matvecs for (M, A, J, J^T) on the inner dofs.

    ``a_matvec`` implements the symmetrized-gradient stiffness
    ``nu int (grad u + grad u^T) : grad v`` with the outflow/Robin facet
    corrections applied through small per-facet element blocks
    (negligible extra cost: tens of facets).
    """

    def __init__(self, W1=None, W2=None, MrefI2=None, N1q=None, JinvT=None,
                 wdet=None, vdofs=None, pdofs=None, detJ=None,
                 fac_elem=None, fac_vdofs=None,
                 nin=None, npc=None, Q=None, nu=None):
        self.W1 = W1            # (12, 2Q) values interp (shared w/ conv)
        self.W2 = W2            # (12, 4Q) reference gradients (q,k,c)
        self.MrefI2 = MrefI2    # (12, 12) reference mass (x) I2
        self.N1q = N1q          # (Q, 3) P1 values at quad pts
        self.JinvT = JinvT      # (nc, d, k)
        self.wdet = wdet        # (nc, Q)  (includes detJ)
        self.detJ = detJ        # (nc,)
        self.vdofs = vdofs      # (nc, 12) -> [0, nin]
        self.pdofs = pdofs      # (nc, 3) -> [0, npc]
        self.fac_elem = fac_elem    # (nf, 12, 12) facet corrections to A
        self.fac_vdofs = fac_vdofs  # (nf, 12)
        self.nin = nin
        self.npc = npc
        self.Q = Q
        self.nu = nu

    _leaf_names = ("W1", "W2", "MrefI2", "N1q", "JinvT", "wdet", "vdofs",
                   "pdofs", "detJ", "fac_elem", "fac_vdofs")
    _aux_names = ("nin", "npc", "Q", "nu")

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._leaf_names),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for n, v in zip(cls._leaf_names, children):
            setattr(obj, n, v)
        for n, v in zip(cls._aux_names, aux):
            setattr(obj, n, v)
        return obj

    # -- construction --------------------------------------------------------
    @classmethod
    def build(cls, prob, dtype=jnp.float64):
        ctx = prob.ctx
        space = prob.space
        Q = ctx.N2.shape[0]
        W1 = np.zeros((12, 2 * Q))
        W2 = np.zeros((12, 4 * Q))
        for q in range(Q):
            for a in range(6):
                for c in range(2):
                    W1[2 * a + c, 2 * q + c] = ctx.N2[q, a]
                    for k in range(2):
                        W2[2 * a + c, 4 * q + 2 * k + c] = ctx.dN2[q, a, k]
        Mref = np.einsum("q,qa,qb->ab", ctx.qwts, ctx.N2, ctx.N2)
        MrefI2 = np.kron(Mref, np.eye(2))

        nin = len(prob.invinds)
        full2in = np.full(prob.nv_full + 1, nin, dtype=np.int32)
        full2in[prob.invinds] = np.arange(nin, dtype=np.int32)
        vd = space.vdofs_of_cells().reshape(-1, 12)
        vdofs = full2in[vd]

        npc = prob.np_cond
        p_full2c = np.full(space.np_full, npc, dtype=np.int32)
        p_full2c[np.arange(npc)] = np.arange(npc, dtype=np.int32)
        pdofs = p_full2c[space.p1_dofmap]

        # facet corrections folded into the assembled A (outflow + Robin)
        # = difference between the full element A and the volume part is
        # already stored in prob.elem_tensors; recover the correction as
        # (elem A) - (volume A) to stay consistent with any later folds
        volA = _volume_a_elements(ctx, prob.nu,
                                  getattr(prob, "gradvsymmtrc", True))
        corr = prob.elem_tensors["A"] - volA
        nrm = np.abs(corr).sum(axis=(1, 2))
        fsel = np.flatnonzero(nrm > 1e-15)
        fac_elem = corr[fsel]
        fac_vdofs = vdofs[fsel]

        return cls(
            W1=jnp.asarray(W1, dtype), W2=jnp.asarray(W2, dtype),
            MrefI2=jnp.asarray(MrefI2, dtype),
            N1q=jnp.asarray(ctx.N1, dtype),
            JinvT=jnp.asarray(ctx.JinvT, dtype),
            wdet=jnp.asarray(ctx.wdet, dtype),
            detJ=jnp.asarray(ctx.detJ, dtype),
            vdofs=jnp.asarray(vdofs), pdofs=jnp.asarray(pdofs),
            fac_elem=jnp.asarray(fac_elem, dtype),
            fac_vdofs=jnp.asarray(fac_vdofs),
            nin=nin, npc=npc, Q=Q, nu=float(prob.nu),
        )

    # -- core pipelines -------------------------------------------------------
    def _gather(self, x):
        xpad = jnp.concatenate(
            [x.astype(self.W1.dtype), jnp.zeros((1,), self.W1.dtype)])
        return xpad[self.vdofs]                             # (nc,12)

    def _scatter(self, fe, out_dtype):
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs.reshape(-1),
            num_segments=self.nin + 1)
        return out[: self.nin].astype(out_dtype)

    def _grad(self, xe):
        """D[e,q,c,d] = d x_c / d x_d at quad points."""
        nc = self.wdet.shape[0]
        rg = (xe @ self.W2).reshape(nc, self.Q, 2, 2)       # (q,k,c)
        return jnp.einsum("edk,eqkc->eqcd", self.JinvT, rg)

    def _grad_pullback(self, F):
        """y_e[(a,c)] = sum_q wdet F[e,q,c,d] gphi[e,q,a,d] via W2^T."""
        nc = self.wdet.shape[0]
        G = jnp.einsum("edk,eqcd->eqkc", self.JinvT, F)
        G = (self.wdet[:, :, None, None] * G).reshape(nc, 4 * self.Q)
        return G @ self.W2.T                                 # (nc,12) MXU

    # -- matvecs ---------------------------------------------------------------
    def m_matvec(self, x):
        xe = self._gather(x)
        fe = self.detJ[:, None] * (xe @ self.MrefI2)
        return self._scatter(fe, x.dtype)

    def a_matvec(self, x):
        xe = self._gather(x)
        D = self._grad(xe)
        F = self.nu * (D + jnp.swapaxes(D, 2, 3))           # 2 nu eps(u)
        fe = self._grad_pullback(F)
        # facet corrections (outflow do-nothing / Robin penalty)
        if self.fac_elem.shape[0]:
            xfe = jnp.concatenate(
                [x.astype(self.W1.dtype),
                 jnp.zeros((1,), self.W1.dtype)])[self.fac_vdofs]
            ffe = jnp.einsum("fab,fb->fa", self.fac_elem, xfe)
            corr = jax.ops.segment_sum(
                ffe.reshape(-1), self.fac_vdofs.reshape(-1),
                num_segments=self.nin + 1)[: self.nin]
            return (self._scatter(fe, x.dtype)
                    + corr.astype(x.dtype))
        return self._scatter(fe, x.dtype)

    def ma_matvec(self, x, cm, ca):
        """Fused ``cm * M @ x + ca * A @ x`` sharing gather/scatter."""
        xe = self._gather(x)
        D = self._grad(xe)
        F = (ca * self.nu) * (D + jnp.swapaxes(D, 2, 3))
        fe = self._grad_pullback(F)
        fe = fe + (cm * self.detJ)[:, None] * (xe @ self.MrefI2)
        out = self._scatter(fe, x.dtype)
        if self.fac_elem.shape[0]:
            xfe = jnp.concatenate(
                [x.astype(self.W1.dtype),
                 jnp.zeros((1,), self.W1.dtype)])[self.fac_vdofs]
            ffe = jnp.einsum("fab,fb->fa", ca * self.fac_elem, xfe)
            corr = jax.ops.segment_sum(
                ffe.reshape(-1), self.fac_vdofs.reshape(-1),
                num_segments=self.nin + 1)[: self.nin]
            out = out + corr.astype(x.dtype)
        return out

    def j_matvec(self, x):
        """``J @ x``: q-weighted divergence."""
        xe = self._gather(x)
        D = self._grad(xe)
        div = D[:, :, 0, 0] + D[:, :, 1, 1]                  # (nc,Q)
        fe = (self.wdet * div) @ self.N1q                    # (nc,3)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.pdofs.reshape(-1),
            num_segments=self.npc + 1)
        return out[: self.npc].astype(x.dtype)

    def view(self, kind, cm=1.0, ca=0.0):
        """A matvec-interface view: kind in {'m','a','ma','j'}; 'ma' is
        the fused ``cm*M + ca*A``; 'j' also exposes ``rmatvec = J^T``."""
        return OpView(self, kind, cm, ca)

    def jt_matvec(self, q):
        """``J^T @ q``."""
        dtp = self.W1.dtype
        qpad = jnp.concatenate(
            [q.astype(dtp), jnp.zeros((1,), dtp)])
        qe = qpad[self.pdofs]                                # (nc,3)
        qq = jnp.einsum("qp,ep->eq", self.N1q, qe)           # (nc,Q)
        eye = jnp.eye(2, dtype=dtp)
        F = qq[:, :, None, None] * eye[None, None]
        fe = self._grad_pullback(F)
        return self._scatter(fe, q.dtype)


@jax.tree_util.register_pytree_node_class
class OpView:
    """Pytree matvec view over an :class:`AffineVectorOps` bundle."""

    def __init__(self, aff, kind, cm=1.0, ca=0.0):
        self.aff = aff
        self.kind = kind
        self.cm = cm
        self.ca = ca

    def tree_flatten(self):
        return ((self.aff,), (self.kind, self.cm, self.ca))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def shape(self):
        n = self.aff.nin
        if self.kind == "j":
            return (self.aff.npc, n)
        return (n, n)

    def matvec(self, x):
        if self.kind == "m":
            return self.aff.m_matvec(x)
        if self.kind == "a":
            return self.aff.a_matvec(x)
        if self.kind == "ma":
            return self.aff.ma_matvec(x, self.cm, self.ca)
        if self.kind == "j":
            return self.aff.j_matvec(x)
        raise ValueError(self.kind)

    def rmatvec(self, q):
        assert self.kind == "j"
        return self.aff.jt_matvec(q)

    def axpy(self, alpha, other):
        """Combine 'm' and 'a' views into a fused 'ma' view."""
        kinds = {self.kind, other.kind}
        assert kinds == {"m", "a"}, kinds
        if self.kind == "m":
            return OpView(self.aff, "ma", cm=1.0, ca=alpha)
        return OpView(self.aff, "ma", cm=alpha, ca=1.0)
