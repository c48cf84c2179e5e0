"""Dof-sharded sparse operators: the spatial domain-decomposition analogue.

The reference is strictly serial (SURVEY.md section 2.10 — no MPI/NCCL
anywhere; dolfin's parallel path is explicitly bypassed at
dolfin_to_sparrays.py:8).  Here the dof axis of the padded-ELL operators
is sharded across an ICI mesh axis with ``shard_map``; the input vector
is all-gathered (one collective per matvec), each device computes its
row block locally.
"""

import numpy as np

import jax
import jax.numpy as jnp
try:                                   # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs,
                  check_rep=True):
        # the top-level API renamed check_rep -> check_vma
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs,
                          check_vma=check_rep)
except ImportError:                    # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import EllMatrix


def pad_rows(ell: EllMatrix, multiple: int) -> EllMatrix:
    """Pad an ELL matrix with empty rows so the row count divides evenly."""
    n, k = ell.vals.shape
    pad = (-n) % multiple
    if pad == 0:
        return ell
    cols = jnp.concatenate(
        [ell.cols, jnp.zeros((pad, k), dtype=ell.cols.dtype)])
    vals = jnp.concatenate(
        [ell.vals, jnp.zeros((pad, k), dtype=ell.vals.dtype)])
    return EllMatrix(cols, vals, (n + pad, ell.shape[1]))


class ShardedEllMatrix:
    """Row-sharded ELL SpMV over a named mesh axis.

    ``matvec`` takes the *global* (replicated) vector and returns the
    global product; rows are computed locally per device, the input is
    all-gathered from its shards (rides ICI).
    """

    def __init__(self, ell: EllMatrix, mesh: Mesh, axis: str = "dof"):
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        self.n_rows = ell.shape[0]
        ell = pad_rows(ell, ndev)
        spec_rows = NamedSharding(mesh, P(axis, None))
        self.cols = jax.device_put(ell.cols, spec_rows)
        self.vals = jax.device_put(ell.vals, spec_rows)
        self.n_cols = ell.shape[1]

        @jax.jit
        def _mv(cols, vals, x):
            def local(cb, vb, xs):
                xg = jax.lax.all_gather(xs, axis, tiled=True)
                return (vb * xg[cb]).sum(axis=1)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis)),
                out_specs=P(axis),
            )(cols, vals, x)

        self._mv = _mv

    def matvec(self, x):
        xpad = jnp.concatenate(
            [x, jnp.zeros(((-len(x)) % self.mesh.shape[self.axis],),
                          x.dtype)])
        y = self._mv(self.cols, self.vals, xpad)
        return y[: self.n_rows]


def make_mesh(n_devices=None, axes=("dof",)):
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    shape = (len(devs),) if len(axes) == 1 else None
    return Mesh(np.array(devs).reshape(shape), axes)
