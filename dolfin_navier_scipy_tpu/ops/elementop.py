"""Element-level (assembly-free) operator application — the TPU-natural
sparse-matrix representation.

A global FEM operator is a sum of per-element dense blocks; applying it
as ``scatter(elem @ gather(x))`` needs only ~12 gathered values per
element plus one batched 12x12 MXU matmul — profiled ~17x faster on TPU
than padded-ELL row gathers (gathers cost ~7ns/element; ELL needs
max-nnz-per-row * n_rows of them, the element form only
12 * n_cells).

This replaces scipy CSR matvecs in all hot paths (the reference's
``M*v_c - .5*dt*A*v_c`` etc., time_int_utils.py:125-128).
"""

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class ElementOp:
    """Velocity-space operator from element tensors, masked to inner dofs.

    ``elem (nc, 12, 12)``, ``dofs (nc, 12)`` mapping each element dof to
    its *inner* index, with ``n`` (= trash) for Dirichlet dofs: columns at
    boundary dofs read 0, rows there scatter into a dropped slot — the
    element-level realization of BC condensation
    (dolfin_to_sparrays.py:548-552).
    """

    def __init__(self, elem, dofs, n):
        self.elem = elem
        self.dofs = dofs
        self.n = n

    def tree_flatten(self):
        return ((self.elem, self.dofs), (self.n,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def shape(self):
        return (self.n, self.n)

    def matvec(self, x):
        xpad = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        xe = xpad[self.dofs]                                 # (nc,12)
        fe = jnp.einsum("eab,eb->ea", self.elem.astype(x.dtype), xe)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.dofs.reshape(-1), num_segments=self.n + 1)
        return out[: self.n]

    def scale(self, alpha):
        return ElementOp(alpha * self.elem, self.dofs, self.n)

    def axpy(self, alpha, other: "ElementOp"):
        """``self + alpha * other`` (same mesh/dof layout)."""
        return ElementOp(self.elem + alpha * other.elem, self.dofs, self.n)


@jax.tree_util.register_pytree_node_class
class DivElementOp:
    """Divergence block ``J`` (pressure rows x velocity cols) and its
    transpose, from element tensors ``(nc, 3, 12)``."""

    def __init__(self, elem, pdofs, vdofs, n_p, n_v):
        self.elem = elem        # (nc, 3, 12)
        self.pdofs = pdofs      # (nc, 3) -> [0, n_p] (n_p = trash)
        self.vdofs = vdofs      # (nc, 12) -> [0, n_v] (n_v = trash)
        self.n_p = n_p
        self.n_v = n_v

    def tree_flatten(self):
        return ((self.elem, self.pdofs, self.vdofs), (self.n_p, self.n_v))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])

    @property
    def shape(self):
        return (self.n_p, self.n_v)

    def matvec(self, v):
        """``J @ v``: velocity (inner) -> pressure."""
        vpad = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        ve = vpad[self.vdofs]
        fe = jnp.einsum("epb,eb->ep", self.elem.astype(v.dtype), ve)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.pdofs.reshape(-1), num_segments=self.n_p + 1)
        return out[: self.n_p]

    def rmatvec(self, q):
        """``J^T @ q``: pressure -> velocity (inner)."""
        qpad = jnp.concatenate([q, jnp.zeros((1,), q.dtype)])
        qe = qpad[self.pdofs]
        fe = jnp.einsum("epb,ep->eb", self.elem.astype(q.dtype), qe)
        out = jax.ops.segment_sum(
            fe.reshape(-1), self.vdofs.reshape(-1), num_segments=self.n_v + 1)
        return out[: self.n_v]


def build_element_ops(prob):
    """Element-level (M, A, J) ops condensed to a problem's inner dofs.

    Uses the element tensors cached at assembly time
    (:func:`..ops.assemble.assemble_stokes` with ``keep_elements``).
    """
    tens = prob.elem_tensors
    space = prob.space
    nin = len(prob.invinds)
    full2in = np.full(prob.nv_full + 1, nin, dtype=np.int32)
    full2in[prob.invinds] = np.arange(nin, dtype=np.int32)
    vd = space.vdofs_of_cells().reshape(-1, 12)
    vdofs = jnp.asarray(full2in[vd])

    npc = prob.np_cond
    p_full2c = np.full(space.np_full, npc, dtype=np.int32)
    # pressure dofs are not condensed (only possibly pinned at the last)
    p_keep = np.arange(npc)
    p_full2c[p_keep] = p_keep.astype(np.int32)
    pdofs = jnp.asarray(p_full2c[space.p1_dofmap])

    M = ElementOp(jnp.asarray(tens["M"]), vdofs, nin)
    A = ElementOp(jnp.asarray(tens["A"]), vdofs, nin)
    J = DivElementOp(jnp.asarray(tens["J"]), pdofs, vdofs, npc, nin)
    return M, A, J
