"""Ensemble (batched) simulation: the embarrassingly-parallel axis.

vmap the CNAB step over a batch of states (e.g. parameter sweeps over
Re, control gains, initial conditions — SURVEY.md section 2.10 names
this as the natural data-parallel axis the serial reference lacks) and
shard the batch across a device-mesh axis with pjit.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ensemble_cnab_step(prob, dt, mesh: Mesh, batch_axis="batch",
                            inv_dtype=None, refine=None):
    """Returns ``(step, place)``:

    ``step(V, NFC)``: one CNAB step applied to a batch of states
    ``V (B, nin)`` with the previous convection ``NFC (B, nin)``;
    jitted with the batch axis sharded over ``batch_axis`` and the
    operators replicated (passed as pytree args, not baked constants).
    ``place(X)``: shards a batch array onto the mesh.
    """
    from ..solve.timeint import _build_ops

    ops = _build_ops(prob, dt, theta=0.5, inv_dtype=inv_dtype, refine=refine)
    repl = NamedSharding(mesh, P())
    bundle = jax.device_put(
        dict(
            ops=ops,
            kern=prob.conv_kernel,
            invinds=jnp.asarray(prob.invinds),
            v_bc=jnp.asarray(prob.bc_full_vec()),
            fv=jnp.asarray(np.asarray(prob.fv).ravel()),
            fp=jnp.asarray(np.asarray(prob.fp).ravel()),
        ),
        repl,
    )
    nin = ops.nin

    def one_step(b, v, nfc_o):
        v_full = b["v_bc"].at[b["invinds"]].set(v)
        nfc_c = -b["kern"].vector(v_full)[b["invinds"]]
        rhs = (b["ops"].M.matvec(v) - 0.5 * dt * b["ops"].A.matvec(v)
               + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * b["fv"])
        sol = b["ops"].solver.solve(rhs, b["fp"])
        return sol[:nin], nfc_c

    batched = jax.vmap(one_step, in_axes=(None, 0, 0))
    spec = NamedSharding(mesh, P(batch_axis, None))

    jitted = jax.jit(
        batched,
        in_shardings=(repl, spec, spec),
        out_shardings=(spec, spec),
    )

    def step(V, NFC):
        return jitted(bundle, V, NFC)

    def place(X):
        return jax.device_put(jnp.asarray(X), spec)

    return step, place


def make_ensemble_cnab_scan(prob, dt, theta=0.5, precision="accurate",
                            mesh=None, batch_axis="batch"):
    """Batched CNAB time loop: B independent trajectories in ONE
    ``lax.scan`` (full-dof dense-inverse layout, increment form).

    TPU rationale: a single trajectory's step is application-latency /
    HBM-bound — the dense saddle inverse is read from HBM once per step
    to multiply ONE vector (docs/PERF_NOTES.md section 6).  vmapping the
    step turns that matvec into one ``(n, n) x (n, B)`` MXU matmul that
    reads the factor once for ALL B trajectories, so aggregate
    trajectory-steps/s scales nearly with B until the MXU saturates.
    This is the TPU-native replacement for the reference's serial
    parameter-sweep workflow (tests/start-generic-tdp-sim.sh +
    time_dep_nse_generic.py: one process per parameter value) — sweeps
    over initial conditions, inflow amplitudes, or control gains ride
    one scan.

    Restrictions: dense-inverse sizes only (``n_all <= ~20k`` dofs, the
    single-chip dense ceiling — use :class:`ShardedSchurSolver` /
    ``halo_cnab_scan`` for larger meshes); autonomous forcing (the
    time-constant ``fv/fp`` of the benchmark problems).

    Returns ``(run, place)``:

    * ``run(V0, n)``: advance a batch ``V0 (B, nin)`` of inner
      velocities by ``n`` CNAB steps; returns the final ``(B, nin)``
      (increment form: f32 kernels, f64 carry in 'accurate' mode).
    * ``place(X)``: device_put with the batch axis sharded over
      ``mesh``'s ``batch_axis`` (single-device layout when ``mesh``
      is None).
    """
    from functools import partial

    from jax import lax

    from ..solve.timeint import _build_ops, _kern, build_full_layout

    ops = _build_ops(prob, dt, theta=theta, precision=precision,
                     linsolver="dense", layout="full")
    fl = build_full_layout(prob, dt, ops)
    kern = _kern(prob, "fast")
    nf, npp = fl["nf"], fl["npp"]
    nin = len(prob.invinds)
    w = ops.wdtype
    cdtype = jnp.float32 if precision == "fast" else jnp.float64
    nu, sym = fl["nu"], fl["sym"]
    bundle = dict(aff=fl["aff"], Zp=fl["Zp"], fv=fl["fv"],
                  kern=kern,
                  fp=jnp.asarray(np.asarray(prob.fp).ravel(), w))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        spec = NamedSharding(mesh, P(batch_axis, None))
        bundle = jax.device_put(bundle, repl)
    else:
        spec = None

    def one_step(b, vf, nfc_o, gp):
        cv, av = b["kern"].vector_and_amatvec(
            vf, nu, sym=sym,
            fac_elem=b["aff"].fac_elem, fac_vdofs=b["aff"].fac_vdofs)
        nfc_c = (-cv).astype(w)
        rhs = (jnp.asarray(-dt, w) * av.astype(w)
               + jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
               + jnp.asarray(dt, w) * b["fv"])
        rp = (b["fp"] - gp).astype(w)
        sol = b["Zp"] @ jnp.concatenate([rhs, rp])
        return vf + sol[:nf].astype(vf.dtype), nfc_c, b["fp"]

    # vmap over the trajectory axis: XLA fuses the B inverse applies
    # into one dot_general over the shared (n, n) factor
    vstep = jax.vmap(one_step, in_axes=(None, 0, 0, 0))

    @partial(jax.jit, static_argnums=3)
    def _run(b, VF0, GP0, n):
        NFC0 = jax.vmap(
            lambda vf: (-b["kern"].vector(vf)).astype(w))(VF0)

        def body(c, _):
            return vstep(b, *c), None

        (VF, _, _), _ = lax.scan(body, (VF0, NFC0, GP0), None, length=n)
        return VF

    import scipy.sparse as sps

    Jc = sps.csr_matrix(prob.Jc)
    vbc = prob.bc_full_vec()
    iv = np.asarray(prob.invinds)

    def place(X):
        X = jnp.asarray(X)
        return jax.device_put(X, spec) if spec is not None else X

    def run(V0, n):
        V0 = np.asarray(V0, np.float64)
        GP0 = place(jnp.asarray((Jc @ V0.T).T, w))
        VF0 = np.tile(vbc, (V0.shape[0], 1))
        VF0[:, iv] = V0
        VF = _run(bundle, place(jnp.asarray(VF0, cdtype)), GP0, int(n))
        return VF[:, iv]

    return run, place


def make_ensemble_wspace_scan(prob, dt, theta=0.5, precision="accurate",
                              mesh=None, batch_axis="batch", refine=0,
                              niter=None):
    """Batched CNAB time loop on the BANDED w-space fast path.

    Same contract as :func:`make_ensemble_cnab_scan` (``(run, place)``;
    ``run(V0, n) -> (B, nin)``) but each member's step is the
    RCM-permuted banded block-Schur step (solve/timeint.py's production
    path): banded F/J/J^T/X (+ the truncated inverse W where engaged),
    the conv/A split with the banded convection tail, and extrapolated
    warm starts.  vmapping that step turns EVERY per-member banded
    application — the F/W/X/S^-1 solves, the diffusion matvec, the
    conv-tail S/G matmuls — into one batched MXU matmul that reads the
    block tables ONCE for all B members, so the aggregate
    trajectory-steps/s scales with B until the MXU saturates (the same
    argument as the dense ensemble scan, now without its ~20k-dof
    dense-inverse ceiling).  This is the TPU-native replacement for the
    reference's one-process-per-parameter sweep workflow
    (tests/start-generic-tdp-sim.sh + time_dep_nse_generic.py).

    Falls back to :func:`make_ensemble_cnab_scan` when the banded mode
    is gated off (3D bandwidth cap, ``DNS_TPU_BANDED=0``).  ``theta``
    must be 0.5 (CNAB's AB2 weights are dt/2-fixed).

    ``refine``/``niter``: per-step residual rounds / warm PCG count
    (defaults mirror the serial scan: ``_NITER_WARM`` warm iterations;
    W replaces the PCG where engaged).
    """
    from functools import partial

    from jax import lax

    from ..ops.banded_conv import build_banded_conv_tail
    from ..solve.timeint import _NITER_WARM, _build_ops, _kern

    if theta != 0.5:
        raise ValueError("the ensemble w-space scan is CNAB (theta=0.5)")
    ops = _build_ops(prob, dt, theta=theta, precision=precision,
                     linsolver="schur", layout="full")
    slv = ops.solver
    if (getattr(slv, "Bblk", None) is None
            or getattr(slv, "Eblk", None) is None):
        return make_ensemble_cnab_scan(prob, dt, theta=theta,
                                       precision=precision, mesh=mesh,
                                       batch_axis=batch_axis)
    w = ops.wdtype
    nf, npp = prob.nv_full, prob.np_cond
    nin_p = slv._nin
    niter_w = niter or _NITER_WARM

    # w-space translation maps (mirrors solve/timeint.py use_w wiring):
    # state = [v_inner in RCM order; bc dofs]; natural order restored
    # only at entry/exit
    wsrc = np.concatenate([
        np.asarray(slv.permf),
        np.setdiff1d(np.arange(nf),
                     np.asarray(prob.invinds))]).astype(np.int64)
    iposx = np.full(nf + 1, nf, np.int32)
    iposx[wsrc] = np.arange(nf, dtype=np.int32)
    kern_w = (_kern(prob, "fast") if w == jnp.float32
              else _kern(prob, "accurate")).with_dof_map(
                  jnp.asarray(iposx))
    fvf = np.zeros(nf)
    fvf[prob.invinds] = np.asarray(prob.fv).ravel()
    fv_w = jnp.asarray(fvf, w)[jnp.asarray(wsrc)]
    pidx = np.asarray(slv.pidx)
    # work-dtype cast is load-bearing: fp rides the scan carry as the
    # gp component — untyped (f64 under x64) it flips the carry dtype
    # between input and output and lax.scan rejects the body
    fp_w = jnp.asarray(np.asarray(prob.fp).ravel(), w)[jnp.asarray(pidx)]

    vbc = np.asarray(prob.bc_full_vec())
    bct = build_banded_conv_tail(kern_w, nin_p,
                                 vbc[wsrc[nin_p:]])
    bundle = dict(slv=slv, kern=kern_w, fv=fv_w, fp=fp_w)
    if bct is not None:
        bundle["bct"] = bct

    cdtype = jnp.float32 if precision == "fast" else jnp.float64
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        spec = NamedSharding(mesh, P(batch_axis, None))
        bundle = jax.device_put(bundle, repl)
    else:
        spec = None

    def one_step(b, vf, nfc_o, gp, ys, ysp):
        s = b["slv"]
        cv = (b["bct"].vector(vf) if bct is not None
              else b["kern"].vector(vf))
        nfc_c = (-cv).astype(w)
        av_i = s.band_extra_mv(vf[:nin_p])
        rhs = (jnp.asarray(0.5 * dt, w) * (3.0 * nfc_c - nfc_o)
               + jnp.asarray(dt, w) * b["fv"])
        rhs = rhs.at[:nin_p].add(jnp.asarray(-dt, w) * av_i.astype(w))
        rp = (b["fp"] - gp).astype(w)
        y0 = 2.0 * ys - ysp
        dvp, _q, y_n = s.solve_warm_wspace(rhs, rp, y0, niter=niter_w,
                                           refine=refine)
        v_n = vf + jnp.concatenate(
            [dvp, jnp.zeros((nf - nin_p,), dvp.dtype)]).astype(vf.dtype)
        return v_n, nfc_c, b["fp"], y_n, ys

    vstep = jax.vmap(one_step, in_axes=(None, 0, 0, 0, 0, 0))

    @partial(jax.jit, static_argnums=3)
    def _run(b, VF0, GP0, n):
        NFC0 = jax.vmap(
            lambda vf: (-(b["bct"].vector(vf) if bct is not None
                          else b["kern"].vector(vf))).astype(w))(VF0)
        B = VF0.shape[0]
        Y0 = jnp.zeros((B, slv.warm_size), w)

        def body(c, _):
            return vstep(b, *c), None

        (VF, _, _, _, _), _ = lax.scan(
            body, (VF0, NFC0, GP0, Y0, Y0), None, length=n)
        return VF

    import scipy.sparse as sps

    Jc = sps.csr_matrix(prob.Jc)
    iv = np.asarray(prob.invinds)
    inat = iposx[iv]

    def place(X):
        X = jnp.asarray(X)
        return jax.device_put(X, spec) if spec is not None else X

    def run(V0, n):
        V0 = np.asarray(V0, np.float64)
        GP0 = place(jnp.asarray((Jc @ V0.T).T[:, pidx], w))
        VF0 = np.tile(vbc, (V0.shape[0], 1))
        VF0[:, iv] = V0
        VF = _run(bundle, place(jnp.asarray(VF0[:, wsrc], cdtype)),
                  GP0, int(n))
        return VF[:, inat]

    return run, place
