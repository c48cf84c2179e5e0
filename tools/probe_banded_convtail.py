"""Banded-matmul gather/scatter for the convection element pipeline.

The lvl1 banded-Schur CNAB step is dominated by the nonlinear
convection pipeline's index ops (gather 148 us + segment_sum 357 us;
docs/PERF_NOTES.md section 6/10 — no index-based reordering helps).
Under the new toolchain the cost model is "HBM bytes + gathers", so the
remaining move is to ELIMINATE the index ops: with elements sorted
along the RCM order, the 0/1 scatter matrix S (nv x nc*nd) and gather
matrix G (nc*nd x nv) are banded in the same sense as F — static
column windows per row block — so both become `_build_banded_rect`
blocks and the pipeline is static slices + batched MXU matmuls, zero
gathers:

    c(v) = S @ quad(G @ v)        vs      segment_sum(quad(v[vd]))

Cost: the S/G block bytes per application (measured here) against the
scatter/gather they replace.

    python tools/probe_banded_convtail.py [level]
"""
import os
import sys
import time
from functools import partial

import numpy as np
import scipy.sparse as sps

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
        els = []
        for k in (1, 2, 3):
            c0 = jax.tree.map(
                lambda a: a * (1.0 + k * 1e-6)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, carry0)
            t0 = time.perf_counter()
            out = run(consts, c0, n)
            jax.tree.map(lambda a: a.block_until_ready(), out)
            els.append(time.perf_counter() - t0)
        ts[n] = float(np.median(els))
    us = (ts[N2] - ts[N1]) / (N2 - N1) * 1e6
    print(f"{name:44s} {us:9.1f} us/application", flush=True)
    return us


def main():
    _arm_cache()
    print(f"canary {bench._ensure_fast_process():.0f} GB/s", flush=True)
    prob, dt = build(level=LEVEL)
    from dolfin_navier_scipy_tpu.solve.timeint import _kern
    from dolfin_navier_scipy_tpu.solve.sadpnt import (
        _build_banded_rect, _rect_mv)
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    # --- replicate the production w-space layout -------------------
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    perm = np.asarray(reverse_cuthill_mckee(F, symmetric_mode=True))
    nv_full, nin = prob.nv_full, F.shape[0]
    bcdofs = np.setdiff1d(np.arange(nv_full), np.asarray(prob.invinds))
    wsrc = np.concatenate([np.asarray(prob.invinds)[perm],
                           bcdofs]).astype(np.int64)
    iposx = np.full(nv_full + 1, nv_full, np.int32)
    iposx[wsrc] = np.arange(nv_full, dtype=np.int32)
    kern = _kern(prob, "fast").with_dof_map(jnp.asarray(iposx))
    nc, nd = kern.vd.shape

    # --- sort elements by mean w-position of their INTERIOR vdofs --
    # (any two interior dofs of one element couple in F, so their RCM
    # positions differ by <= the F bandwidth — the interior-dof mean
    # puts every element's columns within mean +- bw.  Including bc
    # tail positions (>= nin) in the mean would drag boundary elements
    # toward the tail and blow the windows ~7x.)
    vd = np.asarray(kern.vd)
    msk = vd < nin
    mpos = np.where(msk, vd, 0).sum(1) / np.maximum(msk.sum(1), 1)
    mpos[~msk.any(1)] = nin              # bc-only/padding to the end
    eorder = np.argsort(mpos, kind="stable")
    vd_s = vd[eorder]
    kern_s = jax.tree.map(lambda a: a, kern)  # shallow pytree copy
    leaves, aux = kern.tree_flatten()
    kern_s = kern.tree_unflatten(aux, leaves)
    kern_s.JinvT = kern.JinvT[jnp.asarray(eorder)]
    kern_s.wdet = kern.wdet[jnp.asarray(eorder)]
    kern_s.vd = jnp.asarray(vd_s)
    kern_s.vdofs_flat = kern_s.vd.reshape(-1)

    # --- banded S (scatter) and G (gather) -------------------------
    # w-space facts that keep the windows tight: (a) conv values at the
    # bc tail positions are never consumed (the solver slices rhs[:nin]
    # and the bc part of the state never changes) -> S drops all bc
    # rows; (b) the bc tail of v is CONSTANT during the scan -> the
    # gather splits into a banded interior part + a precomputed
    # constant element field.
    nvals = nc * nd
    rows = vd_s.reshape(-1)
    cols = np.arange(nvals)
    keep = rows < nin                       # interior targets only
    S = sps.coo_matrix((np.ones(keep.sum(), np.float32),
                        (rows[keep], cols[keep])),
                       shape=(nin, nvals)).tocsr()
    ident = np.arange
    Sb, Sbases, wS, Spad = _build_banded_rect(
        S, ident(nin), ident(nvals), 256)
    gk = (vd_s.reshape(-1) < nin)           # interior sources only
    G = sps.coo_matrix((np.ones(gk.sum(), np.float32),
                        (cols[gk], vd_s.reshape(-1)[gk])),
                       shape=(nvals, nin)).tocsr()
    Gb, Gbases, wG, Gpad = _build_banded_rect(
        G, ident(nvals), ident(nin), 256)
    print(f"level {LEVEL}: nv_full={nv_full} nin={nin} nc={nc} nd={nd}",
          flush=True)
    print(f"S blocks {Sb.shape} window {wS}  "
          f"{Sb.nbytes / 1e6:.1f} MB", flush=True)
    print(f"G blocks {Gb.shape} window {wG}  "
          f"{Gb.nbytes / 1e6:.1f} MB", flush=True)
    Sb_j, Gb_j = jnp.asarray(Sb), jnp.asarray(Gb)

    # constant bc contribution to the element field: ue_bc (nc, nd)
    consts = dict(kern=kern_s, Sb=Sb_j, Gb=Gb_j)
    meta = dict(Sbases=Sbases, wS=int(wS), Spad=int(Spad),
                Gbases=Gbases, wG=int(wG), Gpad=int(Gpad),
                nv=nv_full, nin=nin, nvals=nvals)

    def quad(k, ue):
        """vector() middle: element loads fe (nc, nd) from ue (nc, nd)."""
        dt_ = k.wdet.dtype
        Q, dim = k.Q, k.dim
        uq = k._bmm(ue, k.W1blk, dim * Q).reshape(k.nc, Q, dim)
        rg = k._bmm(ue, k.W2blk,
                    dim * dim * Q).reshape(k.nc, Q, dim, dim)
        guq = jnp.einsum("edk,eqkc->eqcd", k.JinvT, rg)
        conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
        wconv = (k.wdet[:, :, None] * conv).reshape(k.nc, dim * Q)
        return k._bmm(wconv, k.W3blk, dim * k.nvpc)

    def gather_idx(k, v):
        vpad = jnp.concatenate([v.astype(k.wdet.dtype),
                                jnp.zeros((1,), k.wdet.dtype)])
        return vpad[jnp.minimum(k.vd, nv_full)]

    def gather_banded(b, v):
        ue = _rect_mv(b["Gb"], meta["Gbases"], meta["wG"], meta["nvals"],
                      meta["Gpad"], v[:nin].astype(b["Gb"].dtype))
        return ue.reshape(nc, nd) + b["ue_bc"]

    def scatter_idx(k, fe):
        out = jax.ops.segment_sum(fe.reshape(-1), k.vdofs_flat,
                                  num_segments=nv_full + 1)
        return out[:nv_full]

    def scatter_banded(b, fe):
        y = _rect_mv(b["Sb"], meta["Sbases"], meta["wS"], meta["nin"],
                     meta["Spad"], fe.reshape(-1))
        return jnp.concatenate(
            [y, jnp.zeros((nv_full - nin,), y.dtype)])

    # correctness (the banded forms only produce the INTERIOR rows and
    # consume the constant bc tail via ue_bc — compare on [:nin])
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal(nv_full), jnp.float32)
    ue_bc = gather_idx(kern_s,
                       v0.at[:nin].set(0.0)).astype(jnp.float32)
    consts["ue_bc"] = ue_bc
    ue_i, ue_b = gather_idx(kern_s, v0), gather_banded(consts, v0)
    print(f"gather banded == idx: {float(jnp.abs(ue_i - ue_b).max()):.2e}",
          flush=True)
    fe0 = quad(kern_s, ue_i)
    c_i, c_b = scatter_idx(kern_s, fe0), scatter_banded(consts, fe0)
    den = float(jnp.abs(c_i[:nin]).max())
    print(f"scatter banded == idx: "
          f"{float(jnp.abs((c_i - c_b)[:nin]).max()) / den:.2e} (rel)",
          flush=True)
    ref = kern.vector(v0)
    alt = scatter_banded(consts, quad(kern_s, gather_banded(consts, v0)))
    print(f"full banded pipeline vs kern.vector: "
          f"{float(jnp.abs((ref - alt)[:nin]).max()) / den:.2e} (rel)",
          flush=True)

    # slope timings
    def mk(gf, sf):
        def body(b, c):
            ue = gf(b, c["v"]) if gf is gather_banded else gf(b["kern"],
                                                              c["v"])
            fe = quad(b["kern"], ue)
            y = sf(b, fe) if sf is scatter_banded else sf(b["kern"], fe)
            return dict(v=c["v"] + 1e-12 * y.astype(c["v"].dtype))
        return body

    c0 = dict(v=v0)
    slope_us("idx gather + idx scatter (current)",
             mk(gather_idx, scatter_idx), c0, consts)
    slope_us("banded gather + idx scatter",
             mk(gather_banded, scatter_idx), c0, consts)
    slope_us("idx gather + banded scatter",
             mk(gather_idx, scatter_banded), c0, consts)
    slope_us("banded gather + banded scatter",
             mk(gather_banded, scatter_banded), c0, consts)


if __name__ == "__main__":
    main()
