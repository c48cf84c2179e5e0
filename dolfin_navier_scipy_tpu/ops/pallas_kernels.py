"""Pallas TPU kernels for the hot linear-algebra primitives.

The saddle-point inverse apply ``y = Kinv @ rhs`` streams the full dense
inverse from HBM every step — the bandwidth floor of the time loop.  The
Pallas version computes ``y^T = x^T @ Kinv^T`` with the column axis
tiled over the grid (the vector stays VMEM-resident; one ``(m, TILE)``
panel of the transposed inverse per grid step, double-buffered by the
pipeline).  Lane-dimension rules on TPU (last dim >= 128) make the
row-vector formulation the natural one — column vectors of width 1 do
not legalize.

Falls back to plain XLA when Pallas is unavailable (CPU tests run the
interpreter).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vecmat_kernel(x_ref, KT_ref, y_ref):
    y_ref[:] = jnp.dot(x_ref[:], KT_ref[:],
                       preferred_element_type=jnp.float32)


def vecmat_pallas(x, KT, tile=512, interpret=False):
    """``(x (m,) @ KT (m, n)) -> (n,)`` f32, column-tiled streaming.

    ``n`` must be a multiple of ``tile``; pass ``KT = K.T`` to compute
    ``K @ x`` for a symmetric-storage-free matvec.
    """
    m, n = KT.shape
    assert n % tile == 0, (n, tile)
    y = pl.pallas_call(
        _vecmat_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(x.reshape(1, m), KT)
    return y.reshape(n)
