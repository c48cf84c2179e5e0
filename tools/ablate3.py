"""Slope-based in-scan timing (real TPU, axon-artifact-hardened).

Per-step cost = (t(N2) - t(N1)) / (N2 - N1), where each t() includes a
host fetch of a data-dependent scalar (forces true completion through
the tunnel; block_until_ready alone has shown phantom sub-RTT timings)
and the scan output depends on every iteration.

    python tools/ablate3.py
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

SEQ = [0]


def slope(name, make_run, args, n1, n2, reps=3):
    """make_run(n) -> jitted fn(*args) returning an array; fetches a
    scalar to force completion.  Prints per-step slope."""
    r1, r2 = make_run(n1), make_run(n2)
    f1 = float(np.asarray(jnp.sum(r1(*args))))  # warm/compile
    f2 = float(np.asarray(jnp.sum(r2(*args))))
    ts = {n1: [], n2: []}
    for k in range(reps):
        for n, r in ((n1, r1), (n2, r2)):
            SEQ[0] += 1
            pa = [a + jnp.asarray(SEQ[0] * 1e-5, a.dtype)
                  if hasattr(a, "dtype")
                  and jnp.issubdtype(a.dtype, jnp.floating) else a
                  for a in args]
            t0 = time.perf_counter()
            s = float(np.asarray(jnp.sum(r(*pa))))
            ts[n].append(time.perf_counter() - t0)
    t1, t2 = min(ts[n1]), min(ts[n2])
    us = (t2 - t1) / (n2 - n1) * 1e6
    print(f"{name:38s} {us:9.2f} us/step   "
          f"(t{n1}={t1*1e3:7.1f} ms, t{n2}={t2*1e3:8.1f} ms)")
    assert np.isfinite(f1) and np.isfinite(f2)
    return us


def main():
    _arm_cache()
    prob, dt = build(level=1)
    nf = prob.nv_full
    kern = prob.conv_kernel_f32
    nu = float(prob.nu)
    v0 = jnp.asarray(np.asarray(prob.bc_full_vec()).ravel(), jnp.float32)
    v0 = v0 * 1e-3  # keep iterated sums finite

    # RTT baseline
    @jax.jit
    def rtt(v):
        return v * 1.0000001
    float(np.asarray(jnp.sum(rtt(v0))))
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.asarray(jnp.sum(rtt(v0))))
    print(f"dispatch+fetch RTT ~ {(time.perf_counter()-t0)/5*1e3:.1f} ms")

    def scan_maker(body, unroll=1):
        def make(n):
            @jax.jit
            def run(v):
                out, _ = lax.scan(lambda c, x: (body(c), None), v, None,
                                  length=n, unroll=unroll)
                return out
            return run
        return make

    slope("axpy u1", scan_maker(lambda c: c + 1e-9 * c), [v0], 400, 4000)
    slope("axpy u16", scan_maker(lambda c: c + 1e-9 * c, 16), [v0],
          400, 4000)

    def kernbody(c):
        cv, av = kern.vector_and_amatvec(c, nu)
        return c + 1e-9 * (cv + av)

    slope("elem kern u1", scan_maker(kernbody), [v0], 200, 1000)
    slope("elem kern u8", scan_maker(kernbody, 8), [v0], 200, 1000)

    idx = jnp.minimum(kern.vd.reshape(-1), nf - 1)

    def gatherbody(c):
        g = c[idx]
        return c + 1e-12 * g[:nf]

    slope("gather 22k u1", scan_maker(gatherbody), [v0], 400, 2000)

    vals0 = jnp.ones((kern.nc * 12,), jnp.float32)

    def scatbody(c):
        out = jax.ops.segment_sum(vals0 + c[0], kern.vdofs_flat,
                                  num_segments=nf + 1)
        return c + 1e-12 * out[:nf]

    slope("segsum 22k u1", scan_maker(scatbody), [v0], 400, 2000)

    from dolfin_navier_scipy_tpu.solve.timeint import (_build_ops,
                                                       build_full_layout)
    ops = _build_ops(prob, dt, theta=0.5, precision="fast",
                     linsolver="dense", layout="inner")
    fl = build_full_layout(prob, dt, ops)
    Zp = fl["Zp"]
    n_all = Zp.shape[0]

    def make_z(n):
        @jax.jit
        def run(Z, x):
            def body(c, _):
                return 1e-4 * (Z @ c) + 0.5 * c, None
            out, _ = lax.scan(body, x, None, length=n)
            return out
        return lambda x: run(Zp, x)

    x0 = jnp.ones((n_all,), jnp.float32)
    slope("Zp 288MB matvec", make_z, [x0], 50, 400)
    print(f"  Zp HBM floor {Zp.nbytes/0.82e12*1e6:.0f} us")


if __name__ == "__main__":
    main()
