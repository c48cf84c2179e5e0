"""Per-op in-scan costs under the NEW toolchain (the 'tpu'-platform
plugin, 2026-08-18): the old axon runtime's ~0.4 ms per-application
latency floor measured at 15.6 us this session, which reorders every
design tradeoff.  Measures the candidate F-application forms plus the
Schur-tail factors at a given level.

Slope-hardened (ablate3 method): per-step cost = (t(N2)-t(N1))/(N2-N1),
scan output depends on every iteration, inputs perturbed between runs.

    python tools/probe_newregime.py [level]
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

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N1, N2 = 100, 400


def slope_us(name, body, carry0, consts):
    @partial(jax.jit, static_argnums=2)
    def run(b, c0, n):
        out, _ = lax.scan(lambda c, x: (body(b, c), None), c0, None,
                          length=n)
        return out

    ts = {}
    for n in (N1, N2):
        jax.tree.map(lambda a: a.block_until_ready(), run(consts, carry0, n))
        els, vals = [], []
        for k in (1, 2, 3):
            c0 = jax.tree.map(
                lambda a: a * (1.0 + k * 1e-9)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, carry0)
            t0 = time.perf_counter()
            out = run(consts, c0, n)
            v = np.asarray(jax.tree.leaves(out)[0])
            els.append(time.perf_counter() - t0)
            vals.append(v)
        if np.array_equal(vals[0], vals[1]):
            print(f"  WARNING {name}: result-cache hit?!")
        ts[n] = float(np.median(els))
    us = (ts[N2] - ts[N1]) / (N2 - N1) * 1e6
    print(f"{name:36s} {us:9.1f} us/application", flush=True)
    return us


def main():
    _arm_cache()
    prob, dt = build(level=LEVEL)
    import scipy.sparse as sps

    from dolfin_navier_scipy_tpu.ops.sparse import ell_from_scipy_fast
    from dolfin_navier_scipy_tpu.solve.sadpnt import (_banded_mv,
                                                      _build_banded)
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    nin = len(prob.invinds)
    npp = prob.np_cond
    F = sps.csr_matrix((prob.Mc + 0.5 * dt * prob.Ac).astype(np.float32))
    print(f"level {LEVEL}: nin={nin} np={npp} nnz(F)={F.nnz} "
          f"({F.nnz * 4 / 1e6:.0f} MB csr-ideal)", flush=True)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(nin), jnp.float32)

    # 1) element pipeline (production aff 'ma' view)
    os.environ["DNS_TPU_BANDED"] = "0"
    ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                     linsolver="schur", layout="inner")
    slv = ops.solver
    aff = dict(slv=slv)

    def b_elem(b, c):
        y = b["slv"]._fmv(c["x"])
        return dict(c, x=c["x"] + 1e-12 * y)

    slope_us("element F matvec", b_elem, dict(x=x0), aff)

    # 2) banded F matvec
    blocks, perm, bs, nblk = _build_banded(F)
    print(f"  banded: bs={bs} nblk={nblk} "
          f"({blocks.size * 4 / 1e6:.0f} MB stored)", flush=True)
    cb = dict(B=jnp.asarray(blocks))

    def b_band(b, c):
        y = _banded_mv(b["B"], c["x"], bs, nblk, nin)
        return dict(c, x=c["x"] + 1e-12 * y)

    slope_us("banded F matvec", b_band, dict(x=x0), cb)

    # 3) padded-ELL SpMV (random gather — catastrophic on the OLD
    # toolchain at 2.5 ms; re-test)
    ell = ell_from_scipy_fast(F, dtype=jnp.float32)
    ce = dict(e=ell)

    def b_ell(b, c):
        y = b["e"].matvec(c["x"])
        return dict(c, x=c["x"] + 1e-12 * y)

    slope_us(f"ELL SpMV (K={int(ell.cols.shape[1])})", b_ell, dict(x=x0), ce)

    # 4) Schur tail factors: XT apply and stacked Sinv apply
    XT, Sinv = slv.XT, slv.Sinv
    print(f"  XT {tuple(XT.shape)} ({XT.size * 4 / 1e9:.2f} GB)  "
          f"Sinv {tuple(Sinv.shape)} ({Sinv.size * 4 / 1e9:.2f} GB)",
          flush=True)
    cx = dict(XT=XT, S=Sinv)
    q0 = jnp.asarray(rng.standard_normal(XT.shape[0]), jnp.float32)
    qs = jnp.asarray(rng.standard_normal(Sinv.shape[1]), jnp.float32)

    def b_xt(b, c):
        y = c["x"] @ b["XT"].T if b["XT"].shape[0] == npp \
            else b["XT"].T @ c["q"]
        return dict(c, q=c["q"] + 1e-12 * jnp.sum(y) * c["q"])

    def b_xtq(b, c):
        # X q = (q^T XT)^T : the per-solve back-substitution matmul
        y = c["q"] @ b["XT"]
        return dict(c, q=c["q"] + 1e-12 * jnp.sum(y) * c["q"])

    slope_us("X q (q @ XT)", b_xtq, dict(q=q0), cx)

    def b_s(b, c):
        y = b["S"] @ c["q"]
        return dict(c, q=c["q"] + 1e-12 * jnp.sum(y) * c["q"])

    slope_us("stacked Sinv @ q", b_s, dict(q=qs), cx)

    # 5) full production Schur solve (warm, 6 iters, refine=0)
    cs = dict(slv=slv)
    bvec = jnp.asarray(rng.standard_normal(nin), jnp.float32)

    def b_solve(b, c):
        y = b["slv"]._fsolve(c["x"], niter=6)
        return dict(c, x=c["x"] + 1e-9 * y)

    slope_us("F-solve (PCG 6it, element)", b_solve, dict(x=bvec), cs)

    os.environ["DNS_TPU_BANDED"] = "1"
    ops_b = _build_ops(prob, dt, theta=0.5, precision="accurate",
                       linsolver="schur", layout="inner")
    cs2 = dict(slv=ops_b.solver)
    slope_us("F-solve (PCG 6it, banded)", b_solve, dict(x=bvec), cs2)


if __name__ == "__main__":
    main()
