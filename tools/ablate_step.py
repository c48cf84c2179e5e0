"""In-scan ablation microbench for the lvl1 CNAB step (real TPU).

Measures what each piece of the full-dof step body actually costs
INSIDE a compiled lax.scan (per-op dispatch timings through the axon
tunnel are dominated by the ~0.55 s flat dispatch cost and say nothing
about in-scan cost; see docs/PERF_NOTES.md).  Method: time scans whose
bodies are cumulative prefixes of the step pipeline; the cost of stage
k is t(prefix_k) - t(prefix_{k-1}).

Run strictly alone (one host core; any concurrent process poisons the
numbers 10-30x):

    python tools/ablate_step.py [--level 1] [--nsteps 400]
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: F401,E402  (arms the compile cache, pins matmul f32)
from bench import build, _arm_cache  # noqa: E402

import jax
import jax.numpy as jnp
from jax import lax


def timed_scan(name, body, carry0, consts, nsteps, results):
    """Time `lax.scan(body, carry0)` with perturbed reruns (median of 3)."""

    @partial(jax.jit, static_argnums=2)
    def run(b, c0, n):
        out, _ = lax.scan(lambda c, x: (body(b, c), None), c0, None,
                          length=n)
        return out

    jax.tree.map(lambda a: a.block_until_ready(),
                 run(consts, carry0, nsteps))
    els = []
    vals = []
    for k in (1, 2, 3):
        c0 = jax.tree.map(
            lambda a: a + jnp.asarray(k * 1e-13, a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, carry0)
        t0 = time.perf_counter()
        out = run(consts, c0, nsteps)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        els.append(time.perf_counter() - t0)
        vals.append(np.asarray(jax.tree.leaves(out)[0]))
    if np.array_equal(vals[0], vals[1]):
        print(f"  WARNING {name}: axon result cache hit?!")
    el = float(np.median(els))
    us = el / nsteps * 1e6
    prev = results[-1][1] if results else 0.0
    print(f"{name:34s} {us:9.1f} us/step   (+{us - prev:8.1f})")
    results.append((name, us))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--nsteps", type=int, default=400)
    args = ap.parse_args()
    _arm_cache()

    prob, dt = build(level=args.level)
    from dolfin_navier_scipy_tpu.solve.timeint import (_build_ops,
                                                       build_full_layout)
    kern = prob.conv_kernel_f32
    nf = prob.nv_full
    npp = prob.np_cond
    n_all = len(prob.invinds) + npp
    lin = "dense" if n_all <= 20000 else "schur"
    ops = _build_ops(prob, dt, theta=0.5, precision="fast", linsolver=lin,
                     layout="full" if lin == "schur" else "inner")
    if lin == "dense":
        fl = build_full_layout(prob, dt, ops)
        Zp = fl["Zp"]
        if Zp is None and fl.get("ZpT") is not None:
            # Pallas default layout: reconstruct the XLA-form Zp for the
            # comparison bodies; keep the padded transpose for Pallas
            n_all_f = nf + npp
            Zp = fl["ZpT"][:n_all_f, :n_all_f].T
        aff = fl["aff"]
        fv = fl["fv"]
    else:
        aff = ops.full_schur
        fvbc = -np.asarray(prob.full["A"]
                           @ prob.bc_full_vec()).ravel()[prob.invinds]
        fvf = np.zeros(prob.nv_full)
        fvf[prob.invinds] = np.asarray(prob.fv).ravel() - fvbc
        fv = jnp.asarray(fvf, jnp.float32)
        Zp = None
    nu = float(prob.nu)
    sym = bool(getattr(prob, "gradvsymmtrc", True))
    fp = jnp.asarray(np.asarray(prob.fp).ravel(), jnp.float32)

    v0 = jnp.asarray(np.asarray(prob.bc_full_vec()).ravel(), jnp.float32)
    consts = dict(kern=kern, aff=aff, Zp=Zp, fv=fv, fp=fp,
                  slv=getattr(ops, "solver", None))
    if lin == "dense" and fl.get("ZpT") is not None:
        consts["ZpT"] = fl["ZpT"]
    w = jnp.float32
    results = []
    print(f"level {args.level}: nv_full={nf} np={npp} lin={lin} "
          f"nc={kern.nc}  (us/step, cumulative prefixes)")

    # 0) baseline: pure VPU vector chain
    def body0(b, c):
        v = c["v"]
        return dict(c, v=v + 1e-12 * v)

    timed_scan("0 axpy baseline", body0, dict(v=v0), consts,
               args.nsteps, results)

    # 1) + gather (ue)
    def body1(b, c):
        k = b["kern"]
        upad = jnp.concatenate([c["v"], jnp.zeros((1,), w)])
        ue = upad[jnp.minimum(k.vd, nf)]
        return dict(c, v=c["v"] + 1e-12 * ue.sum() * c["v"])

    timed_scan("1 +gather", body1, dict(v=v0), consts,
               args.nsteps, results)

    # 2) + interpolation bmms (fields at quad, no scatter)
    def body2(b, c):
        k = b["kern"]
        _, uq, guq = k._fields_at_quad(c["v"])
        return dict(c, v=c["v"] + 1e-12 * (uq.sum() + guq.sum()) * c["v"])

    timed_scan("2 +fields_at_quad", body2, dict(v=v0), consts,
               args.nsteps, results)

    # 3) + element loads (conv+stiffness contractions, NO scatter)
    def body3(b, c):
        k = b["kern"]
        _, uq, guq = k._fields_at_quad(c["v"])
        conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
        wconv = (k.wdet[:, :, None] * conv).reshape(k.nc, k.dim * k.Q)
        fe_c = k._bmm(wconv, k.W3blk, k.dim * k.nvpc)
        F = guq + jnp.swapaxes(guq, 2, 3)
        G = jnp.einsum("edk,eqcd->eqkc", k.JinvT, F)
        G = (jnp.asarray(nu, w) * k.wdet[:, :, None, None]
             * G).reshape(k.nc, k.dim * k.dim * k.Q)
        fe_a = k._bmm(G, k.W2Tblk, k.dim * k.nvpc)
        return dict(c, v=c["v"] + 1e-12 * (fe_c.sum() + fe_a.sum())
                    * c["v"])

    timed_scan("3 +element loads", body3, dict(v=v0), consts,
               args.nsteps, results)

    # 4) + the stacked segment_sum (the full fused kernel)
    def body4(b, c):
        cv, av = b["kern"].vector_and_amatvec(
            c["v"], nu, sym=sym, fac_elem=b["aff"].fac_elem,
            fac_vdofs=b["aff"].fac_vdofs)
        return dict(c, v=c["v"] + 1e-12 * (cv + av))

    timed_scan("4 +segment_sum (full kern)", body4, dict(v=v0), consts,
               args.nsteps, results)

    # 5) + rhs assembly
    def body5(b, c):
        cv, av = b["kern"].vector_and_amatvec(
            c["v"], nu, sym=sym, fac_elem=b["aff"].fac_elem,
            fac_vdofs=b["aff"].fac_vdofs)
        nfc_c = -cv
        rhs = (jnp.asarray(-dt, w) * av
               + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - c["nfc"])
               + jnp.asarray(dt, w) * b["fv"])
        return dict(c, v=c["v"] + 1e-12 * rhs, nfc=nfc_c)

    timed_scan("5 +rhs", body5, dict(v=v0, nfc=jnp.zeros((nf,), w)),
               consts, args.nsteps, results)

    # 6) + solver apply (dense Zp or warm Schur)
    if Zp is not None:
        def body6(b, c):
            cv, av = b["kern"].vector_and_amatvec(
                c["v"], nu, sym=sym, fac_elem=b["aff"].fac_elem,
                fac_vdofs=b["aff"].fac_vdofs)
            nfc_c = -cv
            rhs = (jnp.asarray(-dt, w) * av
                   + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - c["nfc"])
                   + jnp.asarray(dt, w) * b["fv"])
            rp = b["fp"] - c["gp"]
            sol = b["Zp"] @ jnp.concatenate([rhs, rp])
            return dict(c, v=c["v"] + sol[:nf] * 1e-6, nfc=nfc_c,
                        gp=b["fp"])
    else:
        def body6(b, c):
            cv, av = b["kern"].vector_and_amatvec(
                c["v"], nu, sym=sym, fac_elem=b["aff"].fac_elem,
                fac_vdofs=b["aff"].fac_vdofs)
            nfc_c = -cv
            rhs = (jnp.asarray(-dt, w) * av
                   + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - c["nfc"])
                   + jnp.asarray(dt, w) * b["fv"])
            rp = b["fp"] - c["gp"]
            sol, y = b["slv"].solve_warm(rhs, rp,
                                         2.0 * c["y"] - c["yp"], niter=6)
            return dict(c, v=c["v"] + sol[:nf] * 1e-6, nfc=nfc_c,
                        gp=b["fp"], y=y, yp=c["y"])

    c6 = dict(v=v0, nfc=jnp.zeros((nf,), w), gp=fp)
    if Zp is None:
        c6.update(y=jnp.zeros((nf,), w), yp=jnp.zeros((nf,), w))
    timed_scan("6 +solver (FULL STEP)", body6, c6, consts,
               args.nsteps, results)

    # isolated: dense matvec only
    if Zp is not None:
        def body7(b, c):
            sol = b["Zp"] @ jnp.concatenate([c["v"], c["gp"]])
            return dict(c, v=c["v"] + 1e-9 * sol[:nf])

        timed_scan("7 Zp matvec ONLY", body7, dict(v=v0, gp=fp),
                   consts, args.nsteps, results)
        gb = consts["Zp"].nbytes / 2**30
        print(f"   Zp: {consts['Zp'].shape} = {gb:.3f} GB "
              f"-> HBM floor ~{gb / 0.8 * 1e3:.2f} ms/step at 820 GB/s")

    if consts.get("ZpT") is not None:
        from dolfin_navier_scipy_tpu.ops.pallas_kernels import vecmat_pallas

        n_pad = int(fl["n_pad"])

        def body7p(b, c):
            rpad = jnp.zeros((n_pad,), jnp.float32)
            rpad = rpad.at[: nf + npp].set(
                jnp.concatenate([c["v"], c["gp"]]))
            sol = vecmat_pallas(rpad, b["ZpT"])[: nf + npp]
            return dict(c, v=c["v"] + 1e-9 * sol[:nf])

        timed_scan("7p ZpT Pallas vecmat ONLY", body7p, dict(v=v0, gp=fp),
                   consts, args.nsteps, results)

    # isolated: segment_sum only (constant values, carry-biased)
    def body8(b, c):
        k = b["kern"]
        vals = c["fe"] + c["v"][0]
        out = jax.ops.segment_sum(vals.reshape(-1), k.vdofs_flat,
                                  num_segments=nf + 1)
        return dict(c, v=c["v"] + 1e-12 * out[:nf])

    fe0 = jnp.ones((kern.nc, kern.dim * kern.nvpc), w)
    timed_scan("8 segment_sum ONLY", body8, dict(v=v0, fe=fe0),
               consts, args.nsteps, results)


if __name__ == "__main__":
    main()
