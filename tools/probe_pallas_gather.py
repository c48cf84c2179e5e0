"""Probe: does the current toolchain's Pallas/Mosaic support the
gather forms needed for a fused element kernel?  (Round-3 blocker,
docs/PERF_NOTES.md section 3: int indexing / jnp.take / take_along_axis
all rejected on the old axon toolchain.)"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kernel, args, expect):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(expect.shape, expect.dtype),
        )(*args)
        ok = np.allclose(np.asarray(out), expect, atol=1e-5)
        print(f"{name}: COMPILES, correct={ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAILS — {msg}", flush=True)


n, m = 1024, 256
x = jnp.arange(n, dtype=jnp.float32)
idx = jnp.asarray(np.random.default_rng(0).integers(0, n, (m, 8)),
                  jnp.int32)
expect = np.asarray(x)[np.asarray(idx)]


def k_take(x_ref, i_ref, o_ref):
    o_ref[...] = jnp.take(x_ref[...], i_ref[...], axis=0)


def k_tal(x_ref, i_ref, o_ref):
    xb = jnp.broadcast_to(x_ref[...][None, :], (m, n))
    o_ref[...] = jnp.take_along_axis(xb, i_ref[...], axis=1)


with jax.disable_jit(False):
    probe("jnp.take(1D->2D)", k_take, (x, idx), expect)
    probe("take_along_axis(bcast)", k_tal, (x, idx), expect)
