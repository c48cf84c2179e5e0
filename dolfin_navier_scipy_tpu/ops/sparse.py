"""Device sparse-matrix format: padded ELL, the TPU-friendly layout.

TPUs want static shapes and contiguous gathers; CSR row-pointer loops do
not map onto the VPU/MXU.  A padded-ELL layout turns SpMV into one gather
plus a small dense reduction — XLA fuses this well, and it is the layout
the Pallas kernels operate on.

Replaces scipy CSR matvecs of the reference's inner loops
(e.g. time_int_utils.py:125-128 ``M*v_c - .5*dt*A*v_c``).
"""

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    """Padded-ELL sparse matrix.

    ``cols (n_rows, K) int32`` column ids (padded entries point at column 0),
    ``vals (n_rows, K)`` values (padded entries are 0).
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    shape: tuple

    def tree_flatten(self):
        return (self.cols, self.vals), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @classmethod
    def from_scipy(cls, mat, dtype=None, pad_to: int = 0):
        """Convert any scipy sparse matrix; ``pad_to`` forces a minimum K
        (useful to share one sparsity layout between M, A, and N)."""
        csr = sps.csr_matrix(mat)
        csr.sum_duplicates()
        n, m = csr.shape
        counts = np.diff(csr.indptr)
        K = max(int(counts.max() if len(counts) else 0), pad_to, 1)
        cols = np.zeros((n, K), dtype=np.int32)
        vals = np.zeros((n, K), dtype=np.float64)
        for i in range(n):
            s, e = csr.indptr[i], csr.indptr[i + 1]
            cols[i, : e - s] = csr.indices[s:e]
            vals[i, : e - s] = csr.data[s:e]
        dtype = dtype or jnp.float64
        return cls(jnp.asarray(cols), jnp.asarray(vals, dtype), (n, m))

    @jax.jit
    def matvec(self, x):
        """``A @ x`` for ``x (m,)`` -> ``(n,)``; one gather + reduce."""
        return (self.vals * x[self.cols]).sum(axis=1)

    def __matmul__(self, x):
        return self.matvec(x)

    @property
    def nnz_padded(self):
        return self.vals.size

    def scale(self, alpha):
        return EllMatrix(self.cols, alpha * self.vals, self.shape)

    def add_same_pattern(self, other: "EllMatrix", alpha=1.0):
        """``self + alpha * other`` — requires identical ``cols`` layout."""
        return EllMatrix(self.cols, self.vals + alpha * other.vals, self.shape)


def ell_from_scipy_fast(mat, dtype=None, pad_to: int = 0) -> EllMatrix:
    """Vectorized (no Python row loop) scipy->ELL conversion."""
    csr = sps.csr_matrix(mat)
    csr.sum_duplicates()
    n, m = csr.shape
    counts = np.diff(csr.indptr)
    K = max(int(counts.max() if len(counts) else 0), pad_to, 1)
    # position of each nnz within its row
    pos = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], counts)
    rows = np.repeat(np.arange(n), counts)
    cols = np.zeros((n, K), dtype=np.int32)
    vals = np.zeros((n, K), dtype=np.float64)
    cols[rows, pos] = csr.indices
    vals[rows, pos] = csr.data
    dtype = dtype or jnp.float64
    return EllMatrix(jnp.asarray(cols), jnp.asarray(vals, dtype), (n, m))
