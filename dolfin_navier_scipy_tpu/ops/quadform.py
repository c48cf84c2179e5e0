"""Quadratic-form representation of the convection: ``N(v)v = H (v (x) v)``.

Twin of the reference's ``ass_convmat_asmatquad``
(dolfin_to_sparrays.py:86-164), which assembles the third-order tensor H
column-by-column through FEniCS (O(N) assemblies).  Here H exists in its
element-local form — one small constant tensor per element,

    hel[e, a, b, (c,k)] = int_e  N_a  dN_b/dx_k  N_c  dx,

so that ``((u.grad) w)`` tested with ``phi_(a,i)`` is
``sum hel[e,a,b,(c,k)] w_(b,i) u_(c,k)`` — a static-sparsity tensor
contraction that runs on device (the reference exports H for quadratic
model reduction / eigenvalue studies; we provide both the device
operator and the exported scipy matrix).
"""

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp


def quad_tensor_elements(ctx):
    """Element tensors ``hel (nc, 6, 6, 12)`` with the last axis packing
    ``(c, k) -> 2*c + k`` (node c, derivative direction k)."""
    hel = np.einsum("eq,qa,eqbk,qc->eabck",
                    ctx.wdet, ctx.N2, ctx.gphi2, ctx.N2)
    nc = hel.shape[0]
    return hel.reshape(nc, 6, 6, 12)


@jax.tree_util.register_pytree_node_class
class QuadConvOp:
    """Device quadratic-convection operator from element tensors."""

    def __init__(self, hel, nodes, vdofs_flat, nv_full):
        self.hel = hel              # (nc,6,6,12)
        self.nodes = nodes          # (nc,6) p2 node ids
        self.vdofs_flat = vdofs_flat
        self.nv_full = nv_full

    @classmethod
    def from_ctx(cls, ctx):
        space = ctx.space
        return cls(
            jnp.asarray(quad_tensor_elements(ctx)),
            jnp.asarray(space.p2_dofmap),
            jnp.asarray(space.vdofs_of_cells().reshape(-1)),
            space.nv_full,
        )

    def tree_flatten(self):
        return ((self.hel, self.nodes, self.vdofs_flat), (self.nv_full,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    def vector(self, w_full, u_full=None):
        """``int ((u.grad) w) . phi`` — must equal
        ``ConvectionKernel.vector(w, u)``; full-dof output."""
        if u_full is None:
            u_full = w_full
        we = w_full.reshape(-1, 2)[self.nodes]          # (nc,6,2) -> w_(b,i)
        ue = u_full.reshape(-1, 2)[self.nodes]          # (nc,6,2)
        uck = jnp.einsum("ebk->ebk", ue).reshape(-1, 12)  # (c,k) packed
        # f[e,a,i] = sum_b,ck hel[e,a,b,ck] w[e,b,i] u[e,ck]
        hu = jnp.einsum("eabm,em->eab", self.hel, uck)
        fe = jnp.einsum("eab,ebi->eai", hu, we)
        return jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs_flat, num_segments=self.nv_full)

    def linearized(self, v_full):
        """Element matrices of the Newton linearization
        ``N1(v) + N2(v)`` from H alone: d/dw [H(w (x) w)] at w=v."""
        ve = v_full.reshape(-1, 2)[self.nodes]
        vck = ve.reshape(-1, 12)
        # N1 part: hel . v over the u-slot -> scalar (a,b) blocks x delta_ij
        hv = jnp.einsum("eabm,em->eab", self.hel, vck)
        eye = jnp.eye(2, dtype=hv.dtype)
        n1 = jnp.einsum("eab,ij->eaibj", hv, eye)
        # N2 part: hel . v over the w-slot
        hw = jnp.einsum("eabm,ebi->eaim", self.hel, ve)   # m=(c,k)
        n2 = hw.reshape(hw.shape[0], 6, 2, 6, 2)           # (a,i,c,k)
        return n1 + n2


def ass_convmat_asmatquad(ctx, space=None, invinds=None):
    """Exported sparse ``H (NV, NV*NV)`` with ``N(v)v = H (v (x) v)``
    on the full dof set — API parity with dolfin_to_sparrays.py:86.

    Kronecker layout: column index ``b_dof * NV + c_dof`` multiplies
    ``w[b_dof] * u[c_dof]`` (matching ``np.kron(v, v)``).
    """
    space = space or ctx.space
    hel = quad_tensor_elements(ctx)          # (nc,6,6,12)
    nc = hel.shape[0]
    NV = space.nv_full
    vd = space.vdofs_of_cells()              # (nc,6,2)
    hel5 = hel.reshape(nc, 6, 6, 6, 2)       # (a, b, c, k)

    rows, cols, vals = [], [], []
    for a in range(6):
        for b in range(6):
            for c in range(6):
                for i in range(2):
                    for k in range(2):
                        rows.append(vd[:, a, i])
                        cols.append(vd[:, b, i] * NV + vd[:, c, k])
                        vals.append(hel5[:, a, b, c, k])
    H = sps.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(NV, NV * NV)).tocsr()
    H.eliminate_zeros()
    return H
