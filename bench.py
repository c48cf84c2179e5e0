"""Headline benchmark: CNAB time-integration throughput on the DFG
cylinder wake (the reference's 2D-2 configuration: Re=100, charvel=1).

Prints ONE JSON line:
    {"metric": ..., "value": steps/s (device), "unit": "steps/s",
     "vs_baseline": speedup over the reference-style scipy-splu loop}

The baseline twin reproduces the reference's per-step recipe
(time_int_utils.py:104-143): one scipy ``splu`` factorization reused for
all steps + per-step convection re-assembly (host, vectorized numpy —
*faster* than the reference's FEniCS round trip, so the reported
speedup is conservative).
"""

import json
import time

import numpy as np


def build():
    from dolfin_navier_scipy_tpu.models import cylinderwake_problem

    prob = cylinderwake_problem(level=1, nu=1e-3, charvel=1.0)  # Re=100
    dt = 2.5e-4
    return prob, dt


def device_steps_per_sec(prob, dt, nsteps=1500, mode="fast", v0=None,
                         ops_cache={}):
    """One CNAB step per scan iteration.

    ``fast``: f32 kernels, no refinement (production-CFD precision);
    ``accurate``: f64 kernels + f64 iterative refinement of the f32
    inverse (matches the f64 LU trajectory to ~1e-11).
    Returns ``(steps_per_sec, final_v)``.

    NOTE: the warmup runs the SAME scan length as the timed call (the
    length is a static arg — a different warmup length would leave the
    compile inside the timing), and the timed call perturbs the input
    (the axon runtime caches results for identical inputs).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dolfin_navier_scipy_tpu.ops.convection import ConvectionKernel
    from dolfin_navier_scipy_tpu.solve.timeint import _build_ops

    if mode == "fast":
        ops = _build_ops(prob, dt, theta=0.5, refine=0)
        aff = prob.affine_ops(jnp.float32)
        kern = ConvectionKernel(prob.ctx, dtype=jnp.float32)
        Eop = aff.view("ma", cm=1.0, ca=-0.5 * dt)
    else:
        ops = _build_ops(prob, dt, theta=0.5, refine=2)
        kern = prob.conv_kernel
        Eop = ops.E
    nin = ops.nin
    bundle = dict(
        ops=ops, E=Eop, kern=kern,
        invinds=jnp.asarray(prob.invinds),
        v_bc=jnp.asarray(prob.bc_full_vec()),
        fv=jnp.asarray(np.asarray(prob.fv).ravel()),
        fp=jnp.asarray(np.asarray(prob.fp).ravel()),
    )

    def step(b, carry, _):
        v, nfc_o = carry
        v_full = b["v_bc"].at[b["invinds"]].set(v)
        nfc_c = -b["kern"].vector(v_full)[b["invinds"]]
        rhs = (b["E"].matvec(v)
               + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * b["fv"])
        sol = b["ops"].solver.solve(rhs, b["fp"])
        return (sol[:nin], nfc_c), None

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(b, v0, n):
        (v, nfc), _ = lax.scan(lambda c, x: step(b, c, x),
                               (v0, jnp.zeros_like(v0)), None, length=n)
        return v

    v0 = jnp.zeros((nin,)) if v0 is None else jnp.asarray(v0)
    run(bundle, v0, nsteps).block_until_ready()      # compile this length
    t0 = time.perf_counter()
    v = run(bundle, v0 + 1e-13, nsteps)              # dodge result cache
    v.block_until_ready()
    el = time.perf_counter() - t0
    assert np.isfinite(np.asarray(v)).all()
    return nsteps / el, np.asarray(v)


def baseline_steps_per_sec(prob, dt, nsteps=60):
    """Reference-style loop: scipy splu + host convection assembly."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    from dolfin_navier_scipy_tpu.ops.convection import (
        convection_vector_host,
    )

    nin = len(prob.invinds)
    npp = prob.np_cond
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(prob.Mc + 0.5 * dt * prob.Ac),
                    sps.csc_matrix(prob.JTc)]),
        sps.hstack([sps.csc_matrix(prob.Jc), sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)
    M, A = sps.csr_matrix(prob.Mc), sps.csr_matrix(prob.Ac)
    fv = np.asarray(prob.fv).ravel()
    fp = np.asarray(prob.fp).ravel()
    bcv = prob.bc_full_vec()
    inv = prob.invinds

    v = np.zeros(nin)
    nfc_o = np.zeros(nin)
    # warm the caches
    full = bcv.copy()
    full[inv] = v
    nfc_o = -convection_vector_host(prob.ctx, full).ravel()[inv]

    t0 = time.perf_counter()
    for _ in range(nsteps):
        full = bcv.copy()
        full[inv] = v
        nfc_c = -convection_vector_host(prob.ctx, full).ravel()[inv]
        rhs = (M @ v - 0.5 * dt * (A @ v)
               + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * fv)
        sol = lu.solve(np.concatenate([rhs, fp]))
        v, nfc_o = sol[:nin], nfc_c
    el = time.perf_counter() - t0
    assert np.isfinite(v).all()
    return nsteps / el


def main():
    t_setup = time.time()
    prob, dt = build()
    dev, _ = device_steps_per_sec(prob, dt, mode="fast")
    dev_acc, _ = device_steps_per_sec(prob, dt, nsteps=200,
                                      mode="accurate")
    base = baseline_steps_per_sec(prob, dt)
    # fast-vs-f64 trajectory accuracy is asserted in the test suite
    # (tests/test_timeint.py::test_fast_precision_mode, <5e-5 relative);
    # at Re=100 a benchmark-horizon norm comparison only measures
    # chaotic separation, so it is not reported here
    print(json.dumps({
        "metric": "cnab_steps_per_sec_cylwake2d",
        "value": round(dev, 2),
        "unit": "steps/s",
        "vs_baseline": round(dev / base, 2),
        "baseline_scipy_splu": round(base, 2),
        "accurate_mode_steps_per_sec": round(dev_acc, 2),
        "accurate_vs_baseline": round(dev_acc / base, 2),
        "dofs": int(len(prob.invinds) + prob.np_cond),
        "setup_s": round(time.time() - t_setup, 1),
    }))


if __name__ == "__main__":
    main()
