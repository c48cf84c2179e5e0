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
    @pl.when(pl.program_id(1) == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    y_ref[:] += jnp.dot(x_ref[:], KT_ref[:],
                        preferred_element_type=jnp.float32)


def vecmat_pallas(x, KT, tile_n=512, tile_m=1024, interpret=False):
    """``(x (m,) @ KT (m, n)) -> (n,)`` f32 with 2D tiling: columns over
    the outer grid axis, the contraction over the inner (accumulating in
    the VMEM-resident output block).

    ``n % tile_n == 0`` and ``m % tile_m == 0``; pass ``KT = K.T`` to
    compute ``K @ x``.
    """
    m, n = KT.shape
    assert n % tile_n == 0 and m % tile_m == 0, (KT.shape, tile_n, tile_m)
    # NOTE: under global x64 the BlockSpec index maps trace to i64 scalars
    # which Mosaic cannot legalize ("func.return (i64, i64)"); the kernel
    # is pure f32, so trace it with x64 disabled.
    with jax.enable_x64(False):
        y = pl.pallas_call(
            _vecmat_kernel,
            grid=(n // tile_n, m // tile_m),
            in_specs=[
                pl.BlockSpec((1, tile_m), lambda i, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, tile_n), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_n), lambda i, k: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            interpret=interpret,
        )(x.reshape(1, m), KT)
    return y.reshape(n)
