"""Second ablation: scan unroll, Zp layout, sorted-gather (real TPU).

    python tools/ablate2.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: F401,E402
from bench import build, _arm_cache  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timed(name, fn, *args, n=3):
    fn(*args)  # warm
    els = []
    for k in range(1, n + 1):
        args_k = [a + jnp.asarray(k * 1e-5, a.dtype)
                  if hasattr(a, "dtype")
                  and jnp.issubdtype(a.dtype, jnp.floating) else a
                  for a in args]
        t0 = time.perf_counter()
        out = fn(*args_k)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        els.append(time.perf_counter() - t0)
    el = float(np.median(els))
    print(f"{name:40s} {el * 1e6:10.1f} us total")
    return el


def main():
    _arm_cache()
    prob, dt = build(level=1)
    nf = prob.nv_full
    kern = prob.conv_kernel_f32
    v0 = jnp.asarray(np.asarray(prob.bc_full_vec()).ravel(), jnp.float32)
    NS = 400

    # --- scan floor vs unroll
    for unroll in (1, 4, 16):
        @partial(jax.jit, static_argnums=(1, 2))
        def run(v, n, u):
            def body(c, x):
                return c + 1e-12 * c, None
            out, _ = lax.scan(body, v, None, length=n, unroll=u)
            return out

        el = timed(f"axpy scan unroll={unroll}", run, v0, NS, unroll)
        print(f"    -> {el / NS * 1e6:8.1f} us/step")

    # --- element kernel in scan vs unroll
    nu = float(prob.nu)
    for unroll in (1, 8):
        @partial(jax.jit, static_argnums=(2, 3))
        def runk(k, v, n, u):
            def body(c, x):
                cv, av = k.vector_and_amatvec(c, nu)
                return c + 1e-9 * (cv + av), None
            out, _ = lax.scan(body, v, None, length=n, unroll=u)
            return out

        el = timed(f"elem kern scan unroll={unroll}", runk, kern, v0,
                   NS, unroll)
        print(f"    -> {el / NS * 1e6:8.1f} us/step")

    # --- gather cost: unsorted vs sorted indices, in scan
    idx_uns = kern.vd.reshape(-1)
    idx_srt = jnp.sort(idx_uns)
    for name, idx in (("gather unsorted", idx_uns),
                      ("gather sorted", idx_srt)):
        @partial(jax.jit, static_argnums=(2,))
        def rung(v, ii, n):
            def body(c, x):
                g = c[jnp.minimum(ii, nf - 1)]
                return c + 1e-12 * g.sum() * c, None
            out, _ = lax.scan(body, v, None, length=n)
            return out

        el = timed(name, rung, v0, idx, NS)
        print(f"    -> {el / NS * 1e6:8.1f} us/step")

    # --- Zp matvec: as-built layout vs fresh copy
    from dolfin_navier_scipy_tpu.solve.timeint import (_build_ops,
                                                       build_full_layout)
    ops = _build_ops(prob, dt, theta=0.5, precision="fast",
                     linsolver="dense", layout="inner")
    fl = build_full_layout(prob, dt, ops)
    Zp = fl["Zp"]
    Zp_fresh = jnp.where(jnp.isnan(Zp), 0.0, Zp)  # eager copy, new layout
    Zp_fresh.block_until_ready()
    x0 = jnp.ones((Zp.shape[1],), jnp.float32)
    for name, Z in (("Zp as built", Zp), ("Zp fresh copy", Zp_fresh)):
        @partial(jax.jit, static_argnums=(2,))
        def runz(Zm, x, n):
            def body(c, _):
                return 1e-3 * (Zm @ c) + c, None
            out, _ = lax.scan(body, x, None, length=n)
            return out

        el = timed(name, runz, Z, x0, 100)
        print(f"    -> {el / 100 * 1e6:8.1f} us/step  "
              f"(floor {Z.nbytes / 0.82e12 * 1e6:.0f} us)")


if __name__ == "__main__":
    main()
