"""Scatter-strategy shootout for the element convection pipeline.

The banded lvl1 CNAB step is dominated by the nonlinear-convection
element pipeline, whose tail is a segment_sum scatter-add (357 us at
lvl1 in the old ablation; scatter-adds serialize on TPU).  Candidates:

  push     jax.ops.segment_sum(fe_flat, vdofs_flat)          (current)
  sorted   segment_sum(fe_flat[perm], sorted_ids, sorted=True)
  pull     fe_pad[pull_idx].sum(1)  — the scatter TRANSPOSED into a
           fixed-width gather + row reduction (pull_idx (nv+1, K)
           built once; padding points at a zero slot)

plus the full kern.vector() with each tail, slope-measured in-scan.

    python tools/probe_scatter.py [level]
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402
from bench import build, _arm_cache  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

LEVEL = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N1, N2 = 100, 400


def slope_us(name, body, carry0, consts):
    @partial(jax.jit, static_argnums=2)
    def run(b, c0, n):
        out, _ = lax.scan(lambda c, x: (body(b, c), None), c0, None,
                          length=n)
        return out

    ts = {}
    for n in (N1, N2):
        jax.tree.map(lambda a: a.block_until_ready(),
                     run(consts, carry0, n))
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
    print(f"{name:40s} {us:9.1f} us/application", flush=True)
    return us


def build_pull(vdofs_flat, nv_full, nvals):
    """(nv_full+1, K) gather table transposing the scatter."""
    ids = np.asarray(vdofs_flat)
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    counts = np.bincount(sids, minlength=nv_full + 1)
    K = int(counts[:nv_full].max())
    starts = np.zeros(nv_full + 1, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    within = np.arange(len(sids)) - starts[sids]
    mask = (sids < nv_full) & (within < K)
    pull = np.full((nv_full, K), nvals, np.int32)
    pull[sids[mask], within[mask]] = order[mask]
    return jnp.asarray(pull), order, sids, K


def main():
    _arm_cache()
    print(f"canary {bench._ensure_fast_process():.0f} GB/s", flush=True)
    prob, dt = build(level=LEVEL)
    from dolfin_navier_scipy_tpu.solve.timeint import _kern

    kern = _kern(prob, "fast")
    nv = prob.nv_full
    nc, nd = kern.vd.shape
    nvals = nc * nd
    pull, order, sids, K = build_pull(kern.vdofs_flat, nv, nvals)
    print(f"level {LEVEL}: nv_full={nv} nc={nc} nd={nd} K={K} "
          f"pull {pull.size * 4 / 1e6:.1f} MB", flush=True)

    rng = np.random.default_rng(0)
    fe = jnp.asarray(rng.standard_normal((nc, nd)), jnp.float32)
    consts = dict(vdofs=kern.vdofs_flat, pull=pull,
                  order=jnp.asarray(order), sids=jnp.asarray(sids),
                  kern=kern)

    # correctness first
    ref = jax.ops.segment_sum(fe.reshape(-1), kern.vdofs_flat,
                              num_segments=nv + 1)[:nv]
    fp = jnp.concatenate([fe.reshape(-1), jnp.zeros((1,), jnp.float32)])
    got = fp[pull].sum(1)
    err = float(jnp.abs(ref - got).max())
    print(f"pull == push: max abs diff {err:.2e}", flush=True)
    assert err < 1e-4

    def b_push(b, c):
        y = jax.ops.segment_sum(c["fe"].reshape(-1), b["vdofs"],
                                num_segments=nv + 1)[:nv]
        return dict(c, fe=c["fe"] * (1 + 1e-12 * y[0]))

    def b_sorted(b, c):
        y = jax.ops.segment_sum(c["fe"].reshape(-1)[b["order"]],
                                b["sids"], num_segments=nv + 1,
                                indices_are_sorted=True)[:nv]
        return dict(c, fe=c["fe"] * (1 + 1e-12 * y[0]))

    def b_pull(b, c):
        fpv = jnp.concatenate([c["fe"].reshape(-1),
                               jnp.zeros((1,), jnp.float32)])
        y = fpv[b["pull"]].sum(1)
        return dict(c, fe=c["fe"] * (1 + 1e-12 * y[0]))

    c0 = dict(fe=fe)
    slope_us("segment_sum (push, current)", b_push, c0, consts)
    slope_us("segment_sum sorted", b_sorted, c0, consts)
    slope_us("pull gather+rowsum", b_pull, c0, consts)

    # full vector() with each tail
    x0 = jnp.asarray(rng.standard_normal(nv), jnp.float32)

    def vec_with_tail(b, u, tail):
        k = b["kern"]
        _, uq, guq = k._fields_at_quad(u)
        conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
        wconv = (k.wdet[:, :, None] * conv).reshape(k.nc, k.dim * k.Q)
        fev = k._bmm(wconv, k.W3blk, k.dim * k.nvpc)
        if tail == "push":
            return jax.ops.segment_sum(fev.reshape(-1), b["vdofs"],
                                       num_segments=nv + 1)[:nv]
        fpv = jnp.concatenate([fev.reshape(-1),
                               jnp.zeros((1,), fev.dtype)])
        return fpv[b["pull"]].sum(1)

    def b_vec_push(b, c):
        y = vec_with_tail(b, c["x"], "push")
        return dict(c, x=c["x"] + 1e-12 * y)

    def b_vec_pull(b, c):
        y = vec_with_tail(b, c["x"], "pull")
        return dict(c, x=c["x"] + 1e-12 * y)

    cv = dict(x=x0)
    slope_us("kern.vector (push tail)", b_vec_push, cv, consts)
    slope_us("kern.vector (pull tail)", b_vec_pull, cv, consts)


if __name__ == "__main__":
    main()
