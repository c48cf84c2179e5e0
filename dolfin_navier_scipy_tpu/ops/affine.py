"""Affine-geometry-factorized operator application — the speed-of-light
formulation for P2/P1 (and CR/DG0) operators on straight triangles.

On affine elements every FEM operator factorizes as
``sum_r geo_r[e] * (constant reference matrix)``: applying M/A/J/J^T
reduces to a few LARGE constant-weight matmuls (MXU) plus small
per-element geometry contractions around one gather and one scatter.
TPU tunings (profiled on v5e):

* **element blocking (f64 only)**: the contraction dim of the constant
  matmuls is only ``dim*nvpc`` (= 12 for 2D P2), wasting MXU lanes when
  f64 is emulated; packing BLK elements per matmul row
  (``X (nc/BLK, BLK*12) @ kron(I_BLK, W)``) recovers ~44x on the f64
  matmuls.  In f32 the native path is faster unblocked.
* **geometry contractions stay einsums**: hand-unrolled broadcasts
  produce small-trailing-dim intermediates that get tile-padded ~256x;
  XLA's einsum picks workable layouts.

Dirichlet condensation is realized by index masking (trash row +
zero-padded columns), as in :mod:`.elementop`.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _volume_a_elements(ctx, nu, gradvsymmtrc=True):
    """Volume part of the stiffness element tensors (nc,dn,dn) — used to
    split the assembled element tensors into volume + facet corrections."""
    nc = ctx.wdet.shape[0]
    nvpc = ctx.N2.shape[1]
    dim = getattr(ctx, "dim", 2)
    K1 = np.einsum("eq,eqad,eqbd->eab", ctx.wdet, ctx.gphi2, ctx.gphi2)
    Avec = np.zeros((nc, nvpc, dim, nvpc, dim))
    for c in range(dim):
        Avec[:, :, c, :, c] += K1
    if gradvsymmtrc:
        Avec += np.einsum("eq,eqbi,eqaj->eaibj", ctx.wdet, ctx.gphi2,
                          ctx.gphi2)
    return nu * Avec.reshape(nc, dim * nvpc, dim * nvpc)


def _pad_rows(arr, nc_pad, fill=0):
    pad = nc_pad - arr.shape[0]
    if pad == 0:
        return arr
    padblock = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, padblock], axis=0)


@jax.tree_util.register_pytree_node_class
class AffineVectorOps:
    """Fused device matvecs for (M, A, J, J^T) on the inner dofs."""

    _leaf_names = ("W1blk", "W2blk", "W2Tblk", "MrefI2blk", "N1q", "JinvT",
                   "wdet", "vdofs", "pdofs", "detJ", "fac_elem", "fac_vdofs")
    _aux_names = ("nin", "npc", "Q", "nu", "nc", "blk", "nvpc", "pnpc",
                  "sym", "dim")

    def __init__(self, **kw):
        for n in self._leaf_names + self._aux_names:
            setattr(self, n, kw.get(n))

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
    def build(cls, prob, dtype=jnp.float64, full_dofs=False):
        """``full_dofs=True`` builds matvecs over the FULL velocity dof
        vector (bc dofs included): no inner<->full index translation per
        application — the fast state layout for time stepping, where a
        zero-padded solver masks the bc rows (outputs carry element
        contributions at bc rows; callers must ignore them)."""
        ctx = prob.ctx
        space = prob.space
        Q = ctx.N2.shape[0]
        nvpc = ctx.N2.shape[1]          # velocity nodes per cell
        pnpc = ctx.N1.shape[1]          # pressure nodes per cell
        dim = getattr(ctx, "dim", 2)
        nd = dim * nvpc
        W1 = np.zeros((nd, dim * Q))
        W2 = np.zeros((nd, dim * dim * Q))
        for q in range(Q):
            for a in range(nvpc):
                for c in range(dim):
                    W1[dim * a + c, dim * q + c] = ctx.N2[q, a]
                    for k in range(dim):
                        W2[dim * a + c,
                           dim * dim * q + dim * k + c] = ctx.dN2[q, a, k]
        Mref = np.einsum("q,qa,qb->ab", ctx.qwts, ctx.N2, ctx.N2)
        MrefI2 = np.kron(Mref, np.eye(dim))

        if full_dofs:
            nin = prob.nv_full
            vdofs = space.vdofs_of_cells().reshape(-1, nd)
        else:
            nin = len(prob.invinds)
            full2in = np.full(prob.nv_full + 1, nin, dtype=np.int32)
            full2in[prob.invinds] = np.arange(nin, dtype=np.int32)
            vd = space.vdofs_of_cells().reshape(-1, nd)
            vdofs = full2in[vd]

        npc = prob.np_cond
        p_full2c = np.full(space.np_full, npc, dtype=np.int32)
        p_full2c[np.arange(npc)] = np.arange(npc, dtype=np.int32)
        pdofs = p_full2c[space.p1_dofmap]

        # facet corrections folded into the assembled A (outflow + Robin):
        # recovered as (stored element A) - (volume A)
        volA = _volume_a_elements(ctx, prob.nu,
                                  getattr(prob, "gradvsymmtrc", True))
        corr = prob.elem_tensors["A"] - volA
        nrm = np.abs(corr).sum(axis=(1, 2))
        fsel = np.flatnonzero(nrm > 1e-15)
        fac_elem = corr[fsel]
        fac_vdofs = vdofs[fsel]

        # element blocking: pack BLK elements per matmul row.
        # Only the emulated-f64 matmuls benefit (44x measured); in f32 the
        # native MXU path is faster unblocked, so blk=1 there.
        nc = ctx.wdet.shape[0]
        blk = max(1, 128 // nd) if dtype == jnp.float64 else 1
        nc_pad = ((nc + blk - 1) // blk) * blk

        def kronblk(W):
            return jnp.asarray(np.kron(np.eye(blk), W), dtype)

        return cls(
            W1blk=kronblk(W1), W2blk=kronblk(W2), W2Tblk=kronblk(W2.T),
            MrefI2blk=kronblk(MrefI2),
            N1q=jnp.asarray(ctx.N1, dtype),
            JinvT=jnp.asarray(_pad_rows(ctx.JinvT, nc_pad), dtype),
            wdet=jnp.asarray(_pad_rows(ctx.wdet, nc_pad), dtype),
            detJ=jnp.asarray(_pad_rows(ctx.detJ, nc_pad), dtype),
            vdofs=jnp.asarray(_pad_rows(vdofs, nc_pad, fill=nin)),
            pdofs=jnp.asarray(_pad_rows(pdofs, nc_pad, fill=npc)),
            fac_elem=jnp.asarray(fac_elem, dtype),
            fac_vdofs=jnp.asarray(fac_vdofs),
            nin=nin, npc=npc, Q=Q, nu=float(prob.nu),
            nc=nc_pad, blk=blk, nvpc=nvpc, pnpc=pnpc,
            sym=bool(getattr(prob, "gradvsymmtrc", True)), dim=dim,
        )

    # -- blocked constant matmul ------------------------------------------------
    def _bmm(self, X, Wblk, out_dim):
        """``X (nc, in) @ W (in, out)`` via BLK-element packing."""
        nc, blk = self.nc, self.blk
        Xb = X.reshape(nc // blk, -1)
        return (Xb @ Wblk).reshape(nc, out_dim)

    # -- core pipelines -------------------------------------------------------
    def _gather(self, x):
        xpad = jnp.concatenate(
            [x.astype(self.wdet.dtype), jnp.zeros((1,), self.wdet.dtype)])
        return xpad[self.vdofs]                             # (nc, 2nvpc)

    def _scatter(self, fe, out_dtype):
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs.reshape(-1),
            num_segments=self.nin + 1)
        return out[: self.nin].astype(out_dtype)

    def _grad(self, xe):
        """D[e,q,c,d] = d x_c / d x_d at quad points."""
        d = self.dim
        rg = self._bmm(xe, self.W2blk, d * d * self.Q)
        rg = rg.reshape(self.nc, self.Q, d, d)              # (q,k,c)
        # NOTE: einsum here (not unrolled broadcasts): small-trailing-dim
        # elementwise intermediates get tile-padded ~256x on TPU
        return jnp.einsum("edk,eqkc->eqcd", self.JinvT, rg)

    def _grad_pullback(self, F):
        """y_e[(a,c)] = sum_q wdet F[e,q,c,d] gphi[e,q,a,d] via W2^T."""
        G = jnp.einsum("edk,eqcd->eqkc", self.JinvT, F)
        G = (self.wdet[:, :, None, None]
             * G).reshape(self.nc, self.dim * self.dim * self.Q)
        return self._bmm(G, self.W2Tblk, self.dim * self.nvpc)

    def _facet_corr(self, x, scale=1.0):
        if self.fac_elem.shape[0] == 0:
            return None
        dtp = self.wdet.dtype
        xfe = jnp.concatenate(
            [x.astype(dtp), jnp.zeros((1,), dtp)])[self.fac_vdofs]
        ffe = jnp.einsum("fab,fb->fa", self.fac_elem, xfe) * scale
        return jax.ops.segment_sum(
            ffe.reshape(-1), self.fac_vdofs.reshape(-1),
            num_segments=self.nin + 1)[: self.nin]

    # -- matvecs ---------------------------------------------------------------
    def m_matvec(self, x):
        xe = self._gather(x)
        fe = self.detJ[:, None] * self._bmm(xe, self.MrefI2blk,
                                            self.dim * self.nvpc)
        return self._scatter(fe, x.dtype)

    def a_matvec(self, x):
        return self.ma_matvec(x, 0.0, 1.0)

    def ma_matvec(self, x, cm, ca):
        """Fused ``cm * M @ x + ca * A @ x`` sharing gather/scatter."""
        xe = self._gather(x)
        D = self._grad(xe)
        if self.sym:
            F = (ca * self.nu) * (D + jnp.swapaxes(D, 2, 3))
        else:
            F = (ca * self.nu) * D
        fe = self._grad_pullback(F)
        if cm != 0.0:
            fe = fe + (cm * self.detJ)[:, None] * self._bmm(
                xe, self.MrefI2blk, self.dim * self.nvpc)
        out = self._scatter(fe, x.dtype)
        corr = self._facet_corr(x, scale=ca)
        if corr is not None:
            out = out + corr.astype(x.dtype)
        return out

    def j_matvec(self, x):
        """``J @ x``: q-weighted divergence."""
        xe = self._gather(x)
        D = self._grad(xe)
        div = jnp.trace(D, axis1=2, axis2=3)                 # (nc,Q)
        fe = (self.wdet * div) @ self.N1q                    # (nc,pnpc)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.pdofs.reshape(-1),
            num_segments=self.npc + 1)
        return out[: self.npc].astype(x.dtype)

    def jt_matvec(self, q):
        """``J^T @ q``."""
        dtp = self.wdet.dtype
        qpad = jnp.concatenate([q.astype(dtp), jnp.zeros((1,), dtp)])
        qe = qpad[self.pdofs]                                # (nc,pnpc)
        qq = jnp.einsum("qp,ep->eq", self.N1q, qe)           # (nc,Q)
        eye = jnp.eye(self.dim, dtype=dtp)
        F = qq[:, :, None, None] * eye[None, None]           # (nc,Q,c,d)
        fe = self._grad_pullback(F)
        return self._scatter(fe, q.dtype)

    def view(self, kind, cm=1.0, ca=0.0):
        """A matvec-interface view: kind in {'m','a','ma','j'}; 'ma' is
        the fused ``cm*M + ca*A``; 'j' also exposes ``rmatvec = J^T``."""
        return OpView(self, kind, cm, ca)


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