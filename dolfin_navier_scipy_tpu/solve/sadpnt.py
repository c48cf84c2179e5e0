"""Saddle-point solvers: the replacement for the reference's external
``sadptprj_riclyap_adi.lin_alg_utils`` ("lau") package.

Solves

    [[A, J^T], [J, 0]] [v; q] = [rhs_v; rhs_p]

with optional low-rank update ``A -> A - umat @ vmat`` applied via
Sherman-Morrison-Woodbury (matching ``lau.solve_sadpnt_smw``; the
feedback hooks in stokes_navier_utils.py:1505-1512 rely on this).

Backends (all reusable across time steps — the property that makes the
reference's CNAB loop fast, time_int_utils.py:89-91):

* :class:`InverseSaddleSolver` — explicit dense inverse applied on the
  MXU; built ON the accelerator (equilibrated f32 LU + Newton-Schulz at
  explicit f32 matmul precision) since the host here is single-core;
  optional residual refinement on the sparse/element operators.  Best
  below ~20k dofs.
* :class:`SchurSaddleSolver` — block-Schur: one host ``splu`` of
  ``F = M + theta dt A`` seeds exact dense Schur factors
  ``X = F^{-1} J^T`` and a double-f32 ``S^{-1}`` pair (stacked into one
  matmul); per solve a fixed-count Jacobi-PCG + two MXU matvecs.  No
  O(n^2) object — the path past the dense ceiling (demonstrated to 61k
  dofs).  :meth:`SchurSaddleSolver.solve_warm` warm-starts the PCG.
* :class:`SMWSolver` — Sherman-Morrison-Woodbury wrap of any base
  solver for static low-rank feedback updates.
* :class:`SaddleSolver` — on-device LU (f32 factor + f64 refinement on
  TPU); small systems and one-shot solves.
* ``host`` — scipy SuperLU twin (:func:`host_saddle_factorized`), the
  correctness oracle and the ``bench.py`` baseline.

Sign convention: the raw saddle solution ``q`` relates to the physical
pressure as ``p = -q`` (the reference flips it too:
stokes_navier_utils.py:403).  These low-level routines return the *raw*
``[v; q]``; high-level solvers flip.
"""

import os as _os
from functools import partial

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spsla

import jax
import jax.numpy as jnp


def _to_dense(mat):
    if sps.issparse(mat):
        return np.asarray(mat.todense())
    return np.asarray(mat)


class SaddleSolver:
    """Reusable on-device factorization of one saddle matrix.

    On TPU (no f64 LU primitive) the factorization is f32 and solves are
    refined against the f64 matrix (iterative refinement); on CPU the
    LU is straight f64.
    """

    def __init__(self, amat, jmat, jmatT=None, dtype=None):
        dtype = dtype or jnp.float64
        nv = amat.shape[0]
        npp = jmat.shape[0]
        jT = jmat.T if jmatT is None else jmatT
        K = np.zeros((nv + npp, nv + npp))
        K[:nv, :nv] = _to_dense(amat)
        K[:nv, nv:] = _to_dense(jT)
        K[nv:, :nv] = _to_dense(jmat)
        self.nv, self.np = nv, npp
        on_cpu = jax.default_backend() == "cpu"
        self.lu_dtype = dtype if on_cpu else jnp.float32
        self.n_refine = 0 if (on_cpu or dtype != jnp.float64) else 4
        self.K = jnp.asarray(K, dtype) if self.n_refine else None
        self.lu, self.piv = jax.scipy.linalg.lu_factor(
            jnp.asarray(K, self.lu_dtype))
        self.dtype = dtype

    def _backsolve(self, B):
        """LU backsolve with iterative refinement; B is (n,) or (n,k)."""
        X = jax.scipy.linalg.lu_solve(
            (self.lu, self.piv), B.astype(self.lu_dtype)
        ).astype(B.dtype)
        for _ in range(self.n_refine):
            R = B - self.K @ X
            X = X + jax.scipy.linalg.lu_solve(
                (self.lu, self.piv), R.astype(self.lu_dtype)
            ).astype(B.dtype)
        return X

    @partial(jax.jit, static_argnums=0)
    def solve(self, rhsv, rhsp):
        """Solve for stacked ``[v; q] (nv+np,)``; jit/scan-safe."""
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        return self._backsolve(rhs)

    @partial(jax.jit, static_argnums=0)
    def solve_smw(self, rhsv, rhsp, umat, vmat):
        """Solve with the rank-k update ``A -> A - umat @ vmat``.

        SMW around the base factorization:
        ``x = x0 + W (I - V W)^{-1} V x0`` with ``W = K^{-1} U_hat``.
        """
        x0 = self.solve(rhsv, rhsp)
        k = umat.shape[1]
        uhat = jnp.vstack([umat, jnp.zeros((self.np, k), dtype=umat.dtype)])
        W = self._backsolve(uhat)
        vhat = jnp.hstack([vmat, jnp.zeros((vmat.shape[0], self.np),
                                           dtype=vmat.dtype)])
        small = jnp.eye(k, dtype=umat.dtype) - vhat @ W
        coef = jnp.linalg.solve(small, vhat @ x0)
        return x0 + W @ coef


def solve_sadpnt(amat=None, jmat=None, jmatT=None, rhsv=None, rhsp=None,
                 umat=None, vmat=None, return_solver=False,
                 krylov=None, krpslvprms=None, krplsprms=None):
    """Functional one-shot API mirroring ``lau.solve_sadpnt_smw``.

    Returns the stacked raw solution ``(nv+np, 1)`` (numpy); with
    ``return_solver=True`` also the reusable :class:`SaddleSolver`.
    ``krylov='gmres'`` routes to the Krylov path with the reference's
    ``krpslvprms`` kwargs bag (tol/maxiter/x0/convstatsl).
    """
    if krylov:
        from .krylov import solve_sadpnt_krylov

        x, _ = solve_sadpnt_krylov(amat=amat, jmat=jmat, jmatT=jmatT,
                                   rhsv=rhsv, rhsp=rhsp,
                                   umat=umat, vmat=vmat,
                                   krpslvprms=krpslvprms,
                                   krplsprms=krplsprms)
        return x
    solver = SaddleSolver(amat, jmat, jmatT)
    if rhsp is None:
        rhsp = jnp.zeros((solver.np,))
    if umat is not None:
        out = solver.solve_smw(jnp.asarray(rhsv), jnp.asarray(rhsp),
                               jnp.asarray(_to_dense(umat)),
                               jnp.asarray(_to_dense(vmat)))
    else:
        out = solver.solve(jnp.asarray(rhsv), jnp.asarray(rhsp))
    out = np.asarray(out).reshape(-1, 1)
    if return_solver:
        return out, solver
    return out


def _ns_polish(Keq, Z, iters):
    """Newton-Schulz iterations ``Z <- 2Z - Z (Keq Z)`` with exact-f32
    matmuls (the TPU default matmul precision is bf16-based and would
    DESTROY the correction — measured: 4e-4 -> 0.47 error without the
    precision override).  Identity-free form: an n^2 dense eye costs
    0.7 GB at the lvl3 Schur size and tips the build over HBM."""
    hp = jax.lax.Precision.HIGHEST
    for _ in range(iters):
        KZ = jnp.matmul(Keq, Z, precision=hp)
        Z = 2.0 * Z - jnp.matmul(Z, KZ, precision=hp)
    return Z


@partial(jax.jit, static_argnames=("iters", "n"))
def _devinv_jit(rows, cols, vals, dinv, iters, n):
    # densify the (equilibrated) sparse K on device: shipping 4 MB of
    # triplets beats pushing the 257 MB dense array through the tunnel
    Keq = jnp.zeros((n, n), jnp.float32).at[rows, cols].set(vals)
    Z = jnp.linalg.inv(Keq)
    Z = _ns_polish(Keq, Z, iters)
    return (Z * dinv[:, None]) * dinv[None, :]


# the device f32 LU (LuDecompositionBlock) overflows its scoped VMEM
# above ~12k rows (measured: OOM at n=13062, 19.1M vs the 16M limit);
# larger matrices go through a recursive 2x2 block-Schur inversion whose
# pivot blocks stay under the ceiling (exactness restored by the
# Newton-Schulz polish afterwards)
_DEV_LU_MAX = 8192


def _inv_blocked(S):
    n = S.shape[0]
    if n <= _DEV_LU_MAX:
        return jnp.linalg.inv(S)
    k = ((n // 2) // 256) * 256 or n // 2
    hp = jax.lax.Precision.HIGHEST
    A, B = S[:k, :k], S[:k, k:]
    C, D = S[k:, :k], S[k:, k:]
    Ai = _inv_blocked(A)
    AiB = jnp.matmul(Ai, B, precision=hp)
    T = D - jnp.matmul(C, AiB, precision=hp)
    Ti = _inv_blocked(T)
    CAi = jnp.matmul(C, Ai, precision=hp)
    TiCAi = jnp.matmul(Ti, CAi, precision=hp)
    top = jnp.concatenate(
        [Ai + jnp.matmul(AiB, TiCAi, precision=hp),
         -jnp.matmul(AiB, Ti, precision=hp)], axis=1)
    bot = jnp.concatenate([-TiCAi, Ti], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("iters",))
def _devinv_dense_jit(Seq, dinv, iters):
    Z = _inv_blocked(Seq)
    Z = _ns_polish(Seq, Z, iters)
    # one MORE Newton-Schulz correction, kept as a SEPARATE low part
    # instead of being rounded into Z: the pair (Z, C) is a double-f32
    # representation of the inverse.  A single f32 inverse solves only
    # to ~kappa(S)*1e-7 (representation floor — 6.6e-3 measured at the
    # lvl3 Schur complement); applying hi+lo as two matvecs recovers
    # the next-NS-iterate accuracy at ~zero per-solve cost.
    # (identity-free: C = Z (I - Seq Z) = Z - Z (Seq Z))
    hp = jax.lax.Precision.HIGHEST
    SZ = jnp.matmul(Seq, Z, precision=hp)
    C = Z - jnp.matmul(Z, SZ, precision=hp)
    Zu = (Z * dinv[:, None]) * dinv[None, :]
    Cu = (C * dinv[:, None]) * dinv[None, :]
    return Zu, Cu


def _device_dense_inverse(S, ns_iters=2):
    """Double-f32 inverse pair ``(hi, lo)`` of a dense (host) matrix
    built on the accelerator — used for the Schur complement
    S = J F^{-1} J^T at large pressure counts, where a single-core host
    O(np^3) inversion takes minutes (lvl3: np=7054)."""
    S = np.asarray(S)
    d = np.sqrt(np.abs(S).max(axis=1))
    d[d == 0] = 1.0
    Seq = jnp.asarray((S / d[:, None]) / d[None, :], jnp.float32)
    Z, C = _devinv_dense_jit(Seq, jnp.asarray(1.0 / d, jnp.float32),
                             ns_iters)
    flush = np.float32(1.2e-38)
    return (jnp.where(jnp.abs(Z) < flush, np.float32(0.0), Z),
            jnp.where(jnp.abs(C) < flush, np.float32(0.0), C))


@partial(jax.jit, static_argnames=("iters",))
def _equilibrate_inv_jit(S, iters):
    """Device-resident variant of :func:`_device_dense_inverse`: the
    Schur complement already lives on the accelerator (built by the
    blocked PCG below) — pulling it through the ~6 MB/s tunnel to
    equilibrate on host would cost minutes at lvl3 sizes."""
    d = jnp.sqrt(jnp.max(jnp.abs(S), axis=1))
    d = jnp.where(d == 0, 1.0, d).astype(jnp.float32)
    Seq = ((S / d[:, None]) / d[None, :]).astype(jnp.float32)
    return _devinv_dense_jit(Seq, 1.0 / d, iters)


@partial(jax.jit, static_argnames=("niter",))
def _block_pcg_jit(fc, fv, dinv, B, niter):
    """Jacobi-PCG on ``F X = B`` for a BLOCK of right-hand sides.

    ``fc/fv`` are F's padded-ELL (cols, vals); per-column step sizes
    ride one (n, k) elementwise pass, the F application is one gather +
    contraction — this is how ``X = F^{-1} J^T`` is built ON the
    accelerator instead of np single-core host backsolves
    (the round-2 lvl3 setup spent ~5 min there)."""
    import jax.lax as lax

    def fmv(P):
        # K sequential (n, width) gathers, NOT one (n, K, width) gather:
        # the fused form transiently allocates n*K*width floats — 5 GB
        # at lvl3 (n=100k, K=49, width=256) — which, on top of the
        # retained chunk results, exhausted HBM during the factor build
        def body(k, acc):
            col = jax.lax.dynamic_index_in_dim(fc, k, axis=1,
                                               keepdims=False)
            val = jax.lax.dynamic_index_in_dim(fv, k, axis=1,
                                               keepdims=False)
            return acc + val[:, None] * P[col, :]

        return lax.fori_loop(0, fc.shape[1], body, jnp.zeros_like(P))

    X = jnp.zeros_like(B)
    R = B
    Z = dinv[:, None] * R
    P = Z
    rz = (R * Z).sum(axis=0)

    def body(_, st):
        X, R, P, rz = st
        AP = fmv(P)
        pAp = (P * AP).sum(axis=0)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = dinv[:, None] * R
        rz_n = (R * Z).sum(axis=0)
        beta = rz_n / jnp.where(rz == 0, 1.0, rz)
        return (X, R, Z + beta[None, :] * P, rz_n)

    X, _, _, _ = lax.fori_loop(0, niter, body, (X, R, P, rz))
    return X


def _delete_buffers(*arrs):
    """Eagerly free device buffers (jax.Array.delete); ignore arrays
    the backend has already invalidated."""
    for a in arrs:
        try:
            a.delete()
        except Exception:
            pass


def _equilibrate_inv_staged(S, iters=2):
    """Double-f32 inverse of a device-resident S in SEPARATE jit calls.

    The monolithic :func:`_equilibrate_inv_jit` peaks at ~8 GB of
    call-local scratch at lvl3 (np=13k: recursive block inversion + NS
    polish all live in one executable); with the large retained factors
    (X^T) alive that tipped the 16 GB chip.  Staging bounds each call's
    working set by the biggest single stage (the block inversion)."""
    # every eager op's result is RETAINED by the axon runtime (op-by-op
    # dispatch = one retained buffer per operator) — keep all np^2
    # expression chains inside single jit calls
    @jax.jit
    def _equilibrate(S):
        d = jnp.sqrt(jnp.max(jnp.abs(S), axis=1))
        d = jnp.where(d == 0, 1.0, d).astype(jnp.float32)
        return ((S / d[:, None]) / d[None, :]).astype(jnp.float32), d

    Seq, d = _equilibrate(S)
    Z0 = jax.jit(_inv_blocked)(Seq)
    Z = jax.jit(_ns_polish, static_argnames=("iters",))(Seq, Z0,
                                                        iters=iters)

    @jax.jit
    def _tail(Seq, Z, d):
        hp = jax.lax.Precision.HIGHEST
        SZ = jnp.matmul(Seq, Z, precision=hp)
        C = Z - jnp.matmul(Z, SZ, precision=hp)
        dinv = 1.0 / d
        return ((Z * dinv[:, None]) * dinv[None, :],
                (C * dinv[:, None]) * dinv[None, :])

    out = _tail(Seq, Z, d)
    jax.block_until_ready(out)
    # a python `del` does NOT reclaim HBM here — the runtime keeps call
    # results alive; explicit buffer deletion does (np^2 each at lvl3)
    _delete_buffers(Z0, Z, Seq)
    return out


def _build_schur_factors_device(F, J, jT, dinv_np, ncg, chunk=256,
                                out_cols=None, colmap=None, want="both",
                                niter=None):
    """Build ``X^T = (F^{-1} J^T)^T`` and ``S = J X`` on the accelerator.

    Column chunks of ``J^T`` are densified on device from (tiny) triplet
    uploads and solved by :func:`_block_pcg_jit`; ``S``'s chunks come
    from one ELL application of ``J``.  Nothing larger than a chunk ever
    crosses the host<->device tunnel.  The TRANSPOSED factor is
    materialized by ONE concatenate of the chunk rows at the end — peak
    2x X.  (A donated in-place ``dynamic_update_slice`` accumulator
    would be 1x in theory, but the axon runtime RETAINS the donated
    generations — its result cache keeps every call's output alive — so
    the chunked writes leaked k * X and OOMed at lvl3/113k dofs within
    ~3 chunks.  2x X fits lvl3 on the 16 GB chip; single-chip lvl4
    remains out of scope — that is what the row-sharded capacity mode
    is for, parallel/spatial.py.)

    ``out_cols``/``colmap``: target column count of ``X^T`` and the
    inner-row -> column mapping (the full-dof layout's bc zero-padding).
    Returns device ``(XT (np_pad, out_cols), S (np, np))`` in f32 with
    ``np_pad`` the chunk-rounded row count (zero tail rows).
    """
    from ..ops.sparse import ell_from_scipy_fast

    nv, npp = jT.shape
    out_cols = out_cols or nv
    cmap = jnp.asarray(np.arange(nv, dtype=np.int32) if colmap is None
                       else np.asarray(colmap, np.int32))
    F_ell = ell_from_scipy_fast(F, dtype=jnp.float32)
    J_ell = ell_from_scipy_fast(J, dtype=jnp.float32)
    dinv = jnp.asarray(dinv_np, jnp.float32)
    jt_coo = sps.coo_matrix(jT)
    order = np.argsort(jt_coo.col, kind="stable")
    r_all, c_all, v_all = (jt_coo.row[order], jt_coo.col[order],
                           jt_coo.data[order])
    # setup-only cost: a generous FIXED count (not ncg-derived) so the
    # compiled executable's cache key depends only on the problem shapes
    # — the remote axon compile is minutes, the warm build ~6 s at lvl2
    niter = niter or max(40, int(ncg) + 12)

    # uniform per-chunk triplet padding; the WHOLE chunk sweep runs as
    # ONE jitted lax.scan: a python loop of per-chunk jit calls leaked
    # its chunk outputs on the axon runtime (the result cache retains
    # every call's output buffers — k * X alive -> OOM at lvl3), and
    # paid the ~0.55 s tunnel dispatch per chunk (52 chunks = ~28 s of
    # pure dispatch at lvl3).  One call = one retained (XT, S) result.
    np_pad = ((npp + chunk - 1) // chunk) * chunk
    nchunks = np_pad // chunk
    bounds = np.searchsorted(c_all, np.arange(0, np_pad + chunk, chunk))
    maxtrip = max(int(np.diff(bounds).max()), 1)
    rows_a = np.zeros((nchunks, maxtrip), np.int32)
    cols_a = np.zeros((nchunks, maxtrip), np.int32)
    vals_a = np.zeros((nchunks, maxtrip), np.float32)
    los_a = np.arange(0, np_pad, chunk, dtype=np.int32)
    for k, lo in enumerate(los_a):
        s, e = bounds[k], bounds[k + 1]
        nt = e - s
        rows_a[k, :nt] = r_all[s:e]
        cols_a[k, :nt] = c_all[s:e] - lo
        # padded triplets alias (0, 0) with value 0 -> harmless .add
        vals_a[k, :nt] = v_all[s:e]

    # ONE jitted lax.scan where it is known-good (single call, single
    # retained result, no per-chunk dispatch); at lvl3+ shapes
    # (nv*np_pad ~ 1.3e9) the scan executable reproducibly crashes the
    # axon TPU worker, so very large problems take the per-chunk-call
    # path with small retained outputs and one final concatenate
    use_scan = (jax.default_backend() == "cpu"
                or nv * np_pad <= int(2.5e8))

    @partial(jax.jit, static_argnames=("width", "n", "oc", "wt"))
    def chunk_solve(rows, cols, vals, lo, cm, width, n, oc, wt):
        B = jnp.zeros((n, width), jnp.float32).at[rows, cols].add(vals)
        Xc = _block_pcg_jit(F_ell.cols, F_ell.vals, dinv, B, niter)
        keep = ((lo + jnp.arange(width)) < npp)[None, :]
        Xc = jnp.where(keep, Xc, jnp.float32(0.0))
        if wt == "S":
            return (J_ell.vals[:, :, None]
                    * Xc[J_ell.cols, :]).sum(axis=1)
        return jnp.zeros((width, oc), jnp.float32).at[:, cm].set(Xc.T)

    if not use_scan:
        outs = []
        for k, lo in enumerate(los_a):
            outs.append(chunk_solve(
                jnp.asarray(rows_a[k]), jnp.asarray(cols_a[k]),
                jnp.asarray(vals_a[k]), jnp.asarray(lo), cmap,
                chunk, nv, out_cols, "S" if want == "S" else "X"))
        if want == "S":
            Sfull = jnp.concatenate(outs, axis=1)
            S = Sfull[:, :npp] if np_pad != npp else Sfull
            S.block_until_ready()
            _delete_buffers(*outs)
            if S is not Sfull:
                _delete_buffers(Sfull)
            return None, S
        if want == "X":
            # assemble in ROW-PARTS of <= ~2 GB: one full-size
            # concatenate peaks at 2x X during setup, which together
            # with the resident S^-1 exhausted lvl3 HBM
            rows_per_part = max(chunk, (int(2.0e9 / 4 / out_cols)
                                        // chunk) * chunk)
            cpp = rows_per_part // chunk
            parts = []
            for s in range(0, len(outs), cpp):
                group = outs[s: s + cpp]
                if len(group) == 1:
                    p = group[0]
                else:
                    p = jnp.concatenate(group, axis=0)
                    p.block_until_ready()
                    _delete_buffers(*group)
                parts.append(p)
            if len(parts) == 1:
                return parts[0], None
            return tuple(parts), None
        raise ValueError("want='both' unsupported on the per-chunk "
                         "path — request 'S' then 'X'")

    @partial(jax.jit, static_argnames=("width", "n", "oc", "wt"))
    def build_all(rows, cols, vals, los, cm, width, n, oc, wt):
        def body(carry, inp):
            XT, S = carry
            r, c, v, lo = inp
            B = jnp.zeros((n, width), jnp.float32).at[r, c].add(v)
            Xc = _block_pcg_jit(F_ell.cols, F_ell.vals, dinv, B, niter)
            # zero the rows beyond npp (ragged tail of the last chunk)
            keep = ((lo + jnp.arange(width)) < npp)[None, :]
            Xc = jnp.where(keep, Xc, jnp.float32(0.0))
            if wt in ("both", "S"):
                Sc = (J_ell.vals[:, :, None]
                      * Xc[J_ell.cols, :]).sum(axis=1)
                S = jax.lax.dynamic_update_slice(
                    S, Sc, (jnp.zeros((), lo.dtype), lo))
            if wt in ("both", "X"):
                XcT = jnp.zeros((width, oc),
                                jnp.float32).at[:, cm].set(Xc.T)
                XT = jax.lax.dynamic_update_slice(
                    XT, XcT, (lo, jnp.zeros((), lo.dtype)))
            return (XT, S), None

        XT0 = jnp.zeros((np_pad, oc) if wt in ("both", "X") else (1, 1),
                        jnp.float32)
        S0 = jnp.zeros((npp, np_pad) if wt in ("both", "S") else (1, 1),
                       jnp.float32)
        (XT, S), _ = jax.lax.scan(body, (XT0, S0),
                                  (rows, cols, vals, los))
        return XT, (S[:, :npp] if wt in ("both", "S") else S)

    XT, S = build_all(jnp.asarray(rows_a), jnp.asarray(cols_a),
                      jnp.asarray(vals_a), jnp.asarray(los_a),
                      cmap, chunk, nv, out_cols, want)
    if want == "S":
        return None, S
    if want == "X":
        return XT, None
    return XT, S


def _device_f32_inverse(K, ns_iters=2):
    """f32 saddle inverse built ON the accelerator: symmetric max-norm
    equilibration (host, sparse) -> device densify + f32 LU inverse ->
    Newton-Schulz polish -> un-equilibrate.  ~1 s at 8k dofs vs minutes
    for a single-core host O(n^3) inversion.

    Returns a DEVICE f32 array re-materialized into a dense default
    layout: the LU kernel's output layout makes subsequent matvecs ~4x
    slower if kept (measured 1678 vs 430 us at 8k)."""
    Ks = sps.coo_matrix(K)
    n = Ks.shape[0]
    d = np.sqrt(np.abs(sps.csr_matrix(Ks)).max(axis=1).toarray().ravel())
    d[d == 0] = 1.0
    vals = (Ks.data / d[Ks.row]) / d[Ks.col]
    Z = _devinv_jit(jnp.asarray(Ks.row), jnp.asarray(Ks.col),
                    jnp.asarray(vals, jnp.float32),
                    jnp.asarray(1.0 / d, jnp.float32), ns_iters, n)
    # eager re-materialization fixes the inherited LU layout
    return jnp.where(jnp.abs(Z) < np.float32(1.2e-38), np.float32(0.0), Z)


@jax.tree_util.register_pytree_node_class
class InverseSaddleSolver:
    """TPU-native reusable saddle solver: explicit inverse on the MXU plus
    float64 iterative refinement with *sparse* residuals.

    Registered as a pytree: pass it INTO jitted functions rather than
    closing over it — the dense inverse must become an HLO parameter,
    not an embedded constant.

    TPUs have no f64 LU/triangular-solve primitives, and the reference's
    one-LU-many-backsolves pattern (time_int_utils.py:89-91) maps poorly
    onto a systolic array.  Instead:

    * setup (host, one-time): factorize ``K = [[A, J^T],[J, 0]]`` in f64
      and form ``K^{-1}``; ship it to device in ``inv_dtype`` (f32 on TPU).
    * per solve (device): ``x0 = Kinv @ rhs`` — a single MXU matmul — then
      ``refine`` rounds of ``x += Kinv @ (rhs - K x)`` with the residual
      computed from the *sparse* ELL operators in f64 (cheap VPU work),
      recovering f64 accuracy from the f32 inverse.
    """

    def __init__(self, amat=None, jmat=None, jmatT=None, refine=None,
                 inv_dtype=None, dtype=None, res_ops=None,
                 inv_method="auto", ns_iters=2,
                 _leaves=None, _aux=None):
        import scipy.linalg as spla

        from ..ops.sparse import ell_from_scipy_fast

        if _leaves is not None:
            (self.Kinv, self.A_ell, self.J_ell, self.JT_ell,
             self.res_ops, self.KinvT) = _leaves
            (self.nv, self.np, self.refine, self.inv_dtype,
             self.dtype, self.use_pallas, self.n_pad) = _aux
            return

        # optional element-level (Kop, Jop) pair for the refinement
        # residual — ~17x faster than the ELL matvecs on TPU
        self.res_ops = res_ops
        dtype = dtype or jnp.float64
        nv, npp = amat.shape[0], jmat.shape[0]
        self.nv, self.np = nv, npp
        jT = jmat.T if jmatT is None else jmatT

        n_all = nv + npp
        on_tpu = jax.default_backend() not in ("cpu",)
        if inv_method == "auto":
            # the host is single-core in this deployment: O(n^3) f64
            # LAPACK takes minutes at 8k dofs.  On an accelerator the f32
            # LU inverse of the row/col-equilibrated K plus Newton-Schulz
            # polish (exact-f32 matmuls) reaches ~1e-6 quality in <1 s.
            inv_method = "device" if (on_tpu and n_all > 3000) else "host"
        if inv_method == "device":
            # keep K sparse: ship triplets, densify on device
            Ksp = sps.bmat([[amat, jT], [jmat, None]], format="coo")
            Kinv = _device_f32_inverse(Ksp, ns_iters=ns_iters)
        else:
            K = np.zeros((n_all, n_all))
            K[:nv, :nv] = _to_dense(amat)
            K[:nv, nv:] = _to_dense(jT)
            K[nv:, :nv] = _to_dense(jmat)
            try:
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    Kinv = np.asarray(jnp.linalg.inv(jnp.asarray(K)))
            except Exception:
                lu, piv = spla.lu_factor(K)
                Kinv = spla.lu_solve((lu, piv), np.eye(n_all))

        if inv_dtype is None:
            inv_dtype = jnp.float32 if on_tpu else dtype
        self.inv_dtype = inv_dtype
        # Pallas inverse-apply: 1.5x the XLA dense matvec on v5e (531 vs
        # 346 GB/s measured); opt-in via DNS_TPU_PALLAS=1, f32-on-TPU only
        import os

        self.use_pallas = (os.environ.get("DNS_TPU_PALLAS", "0") == "1"
                           and inv_dtype == jnp.float32
                           and jax.default_backend() not in ("cpu",)
                           and not isinstance(Kinv, jax.Array))
        if self.use_pallas:
            npad = ((nv + npp + 1023) // 1024) * 1024
            KinvTp = np.zeros((npad, npad), np.float32)
            KinvTp[: nv + npp, : nv + npp] = Kinv.T
            self.KinvT = jnp.asarray(KinvTp)
            self.n_pad = npad
        else:
            self.KinvT = None
            self.n_pad = 0
        if isinstance(Kinv, jax.Array):
            # device-built inverse: already f32 with a clean layout; a
            # host round-trip would cost ~45 s through the axon tunnel
            self.Kinv = Kinv
        else:
            # cast on host before the device transfer (avoids staging the
            # full f64 inverse in HBM: 2x memory spike at large sizes)
            self.Kinv = jnp.asarray(np.asarray(Kinv, dtype=inv_dtype))
        if refine is None:
            refine = 3 if inv_dtype == jnp.float32 else 0
        self.refine = refine
        self.dtype = dtype
        # sparse twins, for residual refinement and matrix-free callers
        self.A_ell = ell_from_scipy_fast(amat, dtype=dtype)
        self.J_ell = ell_from_scipy_fast(jmat, dtype=dtype)
        self.JT_ell = ell_from_scipy_fast(jT, dtype=dtype)

    def tree_flatten(self):
        return ((self.Kinv, self.A_ell, self.J_ell, self.JT_ell,
                 self.res_ops, self.KinvT),
                (self.nv, self.np, self.refine, self.inv_dtype, self.dtype,
                 self.use_pallas, self.n_pad))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def _apply_inv(self, r):
        """``Kinv @ r`` in ``inv_dtype`` (Pallas fast path when enabled)."""
        if self.use_pallas:
            from ..ops.pallas_kernels import vecmat_pallas

            n = self.nv + self.np
            rp = jnp.zeros((self.n_pad,), jnp.float32)
            rp = rp.at[:n].set(r.astype(jnp.float32))
            return vecmat_pallas(rp, self.KinvT)[:n]
        return self.Kinv @ r.astype(self.inv_dtype)

    def _K_matvec(self, x):
        v, q = x[: self.nv], x[self.nv:]
        if self.res_ops is not None:
            Kop, Jop = self.res_ops
            rv = Kop.matvec(v) + Jop.rmatvec(q)
            rp = Jop.matvec(v)
        else:
            rv = self.A_ell.matvec(v) + self.JT_ell.matvec(q)
            rp = self.J_ell.matvec(v)
        return jnp.concatenate([rv, rp])

    def solve(self, rhsv, rhsp):
        """Plain (non-jitted) method: call from within jitted code that
        received this solver as a pytree argument."""
        rhs = jnp.concatenate([rhsv.reshape(-1), rhsp.reshape(-1)])
        x = self._apply_inv(rhs).astype(self.dtype)
        for _ in range(self.refine):
            r = rhs - self._K_matvec(x)
            x = x + self._apply_inv(r).astype(self.dtype)
        return x


def jacobi_pcg(fmv, dinv, b, niter, x0=None):
    """Jacobi-preconditioned CG with a STATIC iteration count — the
    scan/jit-safe inner solve of the block-Schur path (fixed control
    flow; ``fmv`` may hide a ``shard_map`` + ``psum``).  The carry stays
    in ``b``'s dtype regardless of what precision ``fmv`` computes in."""
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0.astype(b.dtype)
        r = b - fmv(x).astype(b.dtype)
    z = (dinv * r).astype(b.dtype)
    p = z
    rz = r @ z

    def body(_, st):
        x, r, p, rz = st
        Ap = fmv(p).astype(b.dtype)
        pAp = p @ Ap
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = (dinv * r).astype(b.dtype)
        rz_n = r @ z
        beta = rz_n / jnp.where(rz == 0, 1.0, rz)
        return (x, r, z + beta * p, rz_n)

    x, _, _, _ = jax.lax.fori_loop(0, niter, body, (x, r, p, rz))
    return x


# MXU pass count of the banded/static-window applications: 'highest'
# (6-pass f32) vs the package default 3-pass 'float32'.  The refined
# Schur path tolerates 3-pass accuracy (the per-step residual round
# absorbs the solve tolerance), but the knob stays measurable:
# DNS_TPU_BAND_PREC=highest restores the 6-pass form.
_BAND_PREC = (jax.lax.Precision.HIGHEST
              if _os.environ.get("DNS_TPU_BAND_PREC",
                                 "highest") == "highest"
              else None)


def _build_banded(F, lane=128):
    """RCM-banded dense-block form of a sparse matrix (host, one-time).

    Returns ``(blocks (nblk, bs, 3bs) f32, perm, bs, nblk)`` with
    ``F[perm][:, perm]`` contained in the block tridiagonal of block
    size ``bs >= bandwidth`` (rounded up to the TPU lane width).  The
    matvec then needs NO gather: neighbors are contiguous block shifts,
    and the contraction is one batched MXU matmul — on TPU this beats
    the element gather->contract->scatter pipeline by the gather/scatter
    latency (measured 1.2 ms/application at 30k dofs vs ~0.2 ms banded;
    docs/PERF_NOTES.md).  Memory is O(n * 3 bs) instead of the O(nnz)
    sparse ideal, but at FEM bandwidths (RCM: ~460 at 30k dofs) that is
    ~100 MB — bytes the MXU streams at full HBM rate.
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    Fc = sps.csr_matrix(F)
    n = Fc.shape[0]
    perm = np.asarray(reverse_cuthill_mckee(Fc, symmetric_mode=True))
    Fp = sps.csr_matrix(Fc[perm][:, perm])
    co = Fp.tocoo()
    bw = int(np.abs(co.row - co.col).max()) if co.nnz else 1
    bs = max(lane, int(np.ceil(bw / lane)) * lane)
    nblk = max(1, int(np.ceil(n / bs)))
    return _fold_banded_blocks(Fp, n, bs, nblk), perm, bs, nblk


def _banded_bandwidth_gb(F, lane=128):
    """Estimated F-band storage (GB) of :func:`_build_banded` WITHOUT
    folding the blocks — the RCM pass only.  Used to gate the banded
    mode: 2D FEM bandwidths give O(100 MB)-O(1 GB) bands, but 3D RCM
    bandwidths scale like n^(2/3) and would blow the block-tridiagonal
    storage past HBM (e.g. ~12 GB at a 122k-dof extruded 3D mesh)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    Fc = sps.csr_matrix(F)
    n = Fc.shape[0]
    perm = np.asarray(reverse_cuthill_mckee(Fc, symmetric_mode=True))
    Fp = sps.coo_matrix(Fc[perm][:, perm])
    bw = int(np.abs(Fp.row - Fp.col).max()) if Fp.nnz else 1
    bs = max(lane, int(np.ceil(bw / lane)) * lane)
    nblk = max(1, int(np.ceil(n / bs)))
    return nblk * bs * 3 * bs * 4 / 1e9


def _fold_banded_blocks(Fp, n, bs, nblk):
    """Fold an (already permuted) sparse matrix into the block-
    tridiagonal dense layout ``(nblk, bs, 3bs)``.  Entries outside the
    tridiagonal window (|row - col| > bs) would be silently dropped —
    callers must guarantee the bandwidth (checked in
    :func:`_build_banded` via ``bs >= bw``; asserted for extra
    same-window folds)."""
    blocks = np.zeros((nblk, bs, 3 * bs), np.float32)
    for k in range(nblk):
        r0, c0 = k * bs, (k - 1) * bs
        rows = slice(r0, min(r0 + bs, n))
        cols = slice(max(c0, 0), min(c0 + 3 * bs, n))
        sub = np.asarray(Fp[rows, cols].todense(), np.float32)
        blocks[k, : sub.shape[0],
               max(c0, 0) - c0: max(c0, 0) - c0 + sub.shape[1]] = sub
    return blocks


def _banded_mv(blocks, xp, bs, nblk, n):
    """``F_perm @ xp`` via the block-tridiagonal dense form (no gather:
    pad -> reshape -> shifted-neighbor concat -> batched matmul)."""
    xpad = jnp.pad(xp, (0, nblk * bs - n)).reshape(nblk, bs)
    zero = jnp.zeros((1, bs), xpad.dtype)
    win = jnp.concatenate(
        [jnp.concatenate([zero, xpad[:-1]], axis=0), xpad,
         jnp.concatenate([xpad[1:], zero], axis=0)], axis=1)
    y = jnp.einsum("kij,kj->ki", blocks, win, precision=_BAND_PREC)
    return y.reshape(-1)[:n]


def _build_banded_rect(A, row_order, col_order, bs_r, lane=128):
    """Static-window dense-block form of a RECTANGULAR sparse matrix.

    Under locality-consistent row/col orders (e.g. pressure rows sorted
    by the mean RCM position of their velocity couplings), row block
    ``k`` of ``A[row_order][:, col_order]`` only touches a contiguous
    column window.  Store ``blocks (nblk, bs_r, w)`` plus the STATIC
    per-block window base — the matvec is ``nblk`` static slices + ONE
    batched MXU matmul, no gather (the TPU-hostile op).  Used for the
    J / J^T applications of the block-Schur solve (the element forms
    cost ~10-40x at lvl2+, docs/PERF_NOTES.md new-toolchain table).

    Returns ``(blocks, bases (tuple of int), w, ncols_pad)``.
    """
    Ap = sps.csr_matrix(sps.csr_matrix(A)[row_order][:, col_order])
    nr, ncl = Ap.shape
    nblk = max(1, (nr + bs_r - 1) // bs_r)
    spans = []
    for k in range(nblk):
        sub = Ap[k * bs_r: min((k + 1) * bs_r, nr)].tocoo()
        spans.append((int(sub.col.min()), int(sub.col.max()) + 1)
                     if sub.nnz else (0, 1))
    w = max(hi - lo for lo, hi in spans)
    w = max(lane, int(np.ceil(w / lane)) * lane)
    ncl_pad = max(ncl, w)
    bases = []
    blocks = np.zeros((nblk, bs_r, w), np.float32)
    for k, (lo, hi) in enumerate(spans):
        b = min(max(lo, 0), ncl_pad - w)
        bases.append(int(b))
        sub = np.asarray(
            Ap[k * bs_r: min((k + 1) * bs_r, nr),
               b: min(b + w, ncl)].todense(), np.float32)
        blocks[k, : sub.shape[0], : sub.shape[1]] = sub
    return blocks, tuple(bases), w, ncl_pad


def _xt_parts_to_banded(parts, bases, bs, nblk, wx, nin, start=0,
                        out=None):
    """Fold device-built ``X^T`` row-parts (pressure rows, permuted
    velocity cols) into the velocity-row-block banded layout
    ``(nblk, bs, wx)`` — static slices only, one jit per part (small
    retained outputs; the parts are deleted by the caller).
    ``start``/``out`` support incremental group-wise folding (the
    banded-W build, whose dense form would not fit HBM at once)."""
    Xb = jnp.zeros((nblk, bs, wx), jnp.float32) if out is None else out
    lo = start
    for p in parts:
        hi = lo + int(p.shape[0])

        def fold(p, Xb, lo=lo, hi=hi):
            for kb in range(nblk):
                b = bases[kb]
                s, e = max(b, lo), min(b + wx, hi)
                r0, ce = kb * bs, min(kb * bs + bs, nin)
                if s >= e or r0 >= ce:
                    continue
                sub = jax.lax.slice(p, (s - lo, r0), (e - lo, ce))
                Xb = jax.lax.dynamic_update_slice(
                    Xb, jnp.transpose(sub)[None].astype(Xb.dtype),
                    (kb, 0, s - b))
            return Xb

        Xb = jax.jit(fold)(p, Xb)
        lo = hi
    return Xb


def _build_winv_banded(Bblk, dinv_perm, bs, nblk, nin, wbases, ww,
                       niter):
    """Localized banded build of the truncated inverse ``W ~ F^{-1}``.

    The SAME exponential decay that justifies truncating W to its
    static window also LOCALIZES each of its columns: the solution of
    ``F x = e_c`` is below the truncation threshold outside ~half a
    window of row ``c``, so each bs-column identity chunk is solved on
    a LOCAL row window of ``ww + 4 bs`` rows with the dense
    block-tridiagonal matvec (one batched MXU matmul per PCG
    iteration) instead of the full-space padded-ELL block-PCG of
    :func:`_build_schur_factors_device`.  Two compounding wins over
    the global build (measured in docs/PERF_NOTES.md section 8): the
    per-iteration operator touches ``nloc`` instead of ``n`` rows
    (~7x fewer FLOPs at lvl3), and the application is the banded
    matmul instead of the gather-based ELL form (whose per-row
    gathers cost ~10-40x the streaming equivalent at lvl2+).

    The zeroed couplings at the local window's edge commit a Dirichlet
    truncation error of the same exponentially-small order as W's own
    band cut; far-field entries beyond the local window (present only
    under the edge-clamped windows, where ``|row - col|`` exceeds the
    decay width) are below the threshold by construction and stay
    zero.  When ``nloc >= n`` the local window IS the full space and
    the build is exactly the global one.
    """
    npad = nblk * bs
    nlocb = min(nblk, (ww + 4 * bs + bs - 1) // bs)
    nloc = nlocb * bs
    dpad = jnp.concatenate([
        jnp.asarray(dinv_perm, jnp.float32),
        jnp.zeros(npad - nin, jnp.float32)])
    wb_arr = jnp.asarray(np.asarray(wbases, np.int32))

    # Bblk/dpad/wb_arr travel as ARGUMENTS: closing over them would
    # embed multi-hundred-MB HLO constants and the remote compile
    # rejects the program with HTTP 413 (seen at lvl3 on fresh shapes;
    # see solve/timeint.py's module docstring for the rule).  W is
    # DONATED: without aliasing each step materializes a second
    # full-size W (2.5 GB at lvl3) next to the factors already
    # resident — the 2026-08-20 runtime aborts there
    @partial(jax.jit, donate_argnums=(0,))
    def step(W, Bblk, dpad, wb_arr, kb0, kc):
        blks = jax.lax.dynamic_slice(
            Bblk, (kb0, 0, 0), (nlocb, bs, 3 * bs))
        # Dirichlet-truncate the couplings that reach outside the local
        # window (left neighbor of the first block / right neighbor of
        # the last) — keeps the local operator a principal submatrix
        # of F (SPD, PCG-safe)
        blks = blks.at[0, :, :bs].set(0.0)
        blks = blks.at[nlocb - 1, :, 2 * bs:].set(0.0)
        dl = jax.lax.dynamic_slice(dpad, (kb0 * bs,), (nloc,))

        gcol = kc * bs + jnp.arange(bs)
        B = jnp.zeros((nloc, bs), jnp.float32).at[
            (kc - kb0) * bs + jnp.arange(bs), jnp.arange(bs)].set(
                jnp.where(gcol < nin, 1.0, 0.0))

        def fmv(P):
            Pb = P.reshape(nlocb, bs, bs)
            zero = jnp.zeros_like(Pb[:1])
            win = jnp.concatenate(
                [jnp.concatenate([zero, Pb[:-1]], axis=0), Pb,
                 jnp.concatenate([Pb[1:], zero], axis=0)], axis=1)
            return jnp.einsum("kij,kjw->kiw", blks, win,
                              precision=_BAND_PREC).reshape(nloc, bs)

        X = jnp.zeros_like(B)
        R = B
        Z = dl[:, None] * R
        P = Z
        rz = (R * Z).sum(axis=0)

        def body(_, st):
            X, R, P, rz = st
            AP = fmv(P)
            pAp = (P * AP).sum(axis=0)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            X = X + alpha[None, :] * P
            R = R - alpha[None, :] * AP
            Z = dl[:, None] * R
            rz_n = (R * Z).sum(axis=0)
            beta = rz_n / jnp.where(rz == 0, 1.0, rz)
            return (X, R, Z + beta[None, :] * P, rz_n)

        X, _, _, _ = jax.lax.fori_loop(0, niter, body, (X, R, P, rz))

        # fold: X[t*bs + i, c] = F^{-1}[(kb0+t) bs + i, kc bs + c];
        # target W[kb, i, j] with j = kc bs + c - wbases[kb] (out-of-
        # window j are pushed OOB and dropped by the scatter)
        Xb3 = X.reshape(nlocb, bs, bs)
        contrib = []
        for t in range(nlocb):
            j = gcol - wb_arr[kb0 + t]
            j = jnp.where((j >= 0) & (j < ww), j, ww)
            contrib.append(
                jnp.zeros((bs, ww), jnp.float32).at[:, j].add(Xb3[t]))
        W_loc = jax.lax.dynamic_slice(W, (kb0, 0, 0), (nlocb, bs, ww))
        return jax.lax.dynamic_update_slice(
            W, W_loc + jnp.stack(contrib), (kb0, 0, 0))

    W = jnp.zeros((nblk, bs, ww), jnp.float32)
    for kc in range(nblk):
        kb0 = min(max(kc - (nlocb - 1) // 2, 0), nblk - nlocb)
        W = step(W, Bblk, dpad, wb_arr, kb0, kc)   # W donated in
        W.block_until_ready()
    return W


def _build_winv_banded_subproc(Bblk_host, dinv_perm, bs, nblk, nin,
                               wbases, ww, niter):
    """Run :func:`_build_winv_banded` in a THROWAWAY process and ship
    the blocks through host memory (VERDICT r4 #4).

    The build aborts the tunneled TPU client at lvl3 shapes when its
    process context already holds the X/S factor-build programs, and
    the abort poisons every later dispatch in that process
    (docs/PERF_NOTES.md section 18.2) — so at risky shapes the build
    runs in a clean subprocess with its own TPU client (concurrent
    tunnel clients verified healthy 2026-08-21) and only the finished
    f32 blocks enter this process.  ``Bblk_host`` must be the HOST copy
    of the banded F blocks (shipping the device copy back through the
    tunnel would cost minutes at lvl3's 1.2 GB).

    Returns the W blocks as a host array; raises on subprocess failure
    (caller falls back to the W-less PCG-on-banded-F config).
    """
    import subprocess
    import sys as _sys
    import tempfile

    pkgroot = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    # generous default: in slow tunnel windows the subprocess's client
    # init + first compiles alone have measured 5-12 min (2026-08-21)
    timeout_s = float(_os.environ.get(
        "DNS_TPU_WINV_SUBPROC_TIMEOUT_S", "1500"))
    with tempfile.TemporaryDirectory() as td:
        inp = _os.path.join(td, "winv_in.npz")
        outp = _os.path.join(td, "winv_out.npy")
        np.savez(inp, Bblk=np.asarray(Bblk_host, np.float32),
                 dinv_perm=np.asarray(dinv_perm, np.float32),
                 bs=bs, nblk=nblk, nin=nin,
                 wbases=np.asarray(wbases, np.int64),
                 ww=ww, niter=niter)
        env = dict(_os.environ)
        env["PYTHONPATH"] = (pkgroot + _os.pathsep
                             + env.get("PYTHONPATH", ""))
        r = subprocess.run(
            [_sys.executable, "-m",
             "dolfin_navier_scipy_tpu.solve._winv_subproc", inp, outp],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        if r.returncode != 0 or not _os.path.exists(outp):
            raise RuntimeError(
                "W subprocess build failed rc=%s: %s"
                % (r.returncode, (r.stderr or "")[-300:]))
        return np.load(outp)


def _rect_mv(blocks, bases, w, nrows, ncl_pad, x):
    """``A_perm @ x`` via the static-window block form (slices + one
    batched matmul; ``bases`` are compile-time constants)."""
    xpad = jnp.pad(x, (0, ncl_pad - x.shape[0]))
    xw = jnp.stack([jax.lax.slice(xpad, (b,), (b + w,)) for b in bases])
    y = jnp.einsum("kij,kj->ki", blocks, xw, precision=_BAND_PREC)
    return y.reshape(-1)[:nrows]


def _pair_stack(blocks, parts=2):
    """bf16 hi/lo ROW-stack of f32 banded blocks: ``(k, parts*bs, w)``
    with ``hi = bf16(B)`` rows first and residual levels below.

    bf16 is the MXU's NATIVE operand: the measured per-application cost
    of a bf16 block stream is 2.4x below the same f32 blocks
    (tools/probe_lowbit.py, 2026-08-21: W-shaped 606 MB f32 912.6 us vs
    bf16 378.4; int16/f16 converts do NOT fuse and land back at f32
    cost).  The row-stacked pair applies as ONE einsum whose output
    rows fold (``y_hi + y_lo``) — 16 effective mantissa bits
    (~1.5e-5), f32 bytes at bf16 MXU speed — while slicing the hi rows
    alone streams HALF the f32 bytes at bf16 speed with ~4e-3 rounding.
    The asymmetric schedule (hi-only predictor, pair refine) keeps the
    refine contraction at the window-truncation floor, so the
    trajectory cannot see the storage change.  ``parts=3`` appends a
    second residual level (``lo2 = bf16(B - hi - lo)``, ~24 effective
    mantissa bits ~ f32 grade): measured at lvl2, the 16-bit pair
    leaves a ~7e-7 per-factor refine floor that SUMS across W/X/S^-1
    to 1.5e-6 — the tri-split restores the f32 refine floor on the
    factors that need it at 1.5x the f32 byte count only in the refine
    application (the predictor still streams hi alone).  Runs on the
    array's own backend (device factors never round-trip the
    tunnel)."""

    @partial(jax.jit, static_argnums=1)
    def conv(B, nparts):
        # optimization_barrier is LOAD-BEARING: XLA's excess-precision
        # folding elides the f32->bf16->f32 roundtrip inside one jitted
        # program, which silently turns the residual levels into zero
        # and degrades the stack to single-bf16 (~4e-3) — observed on
        # the TPU backend 2026-08-21; the barrier forces each rounded
        # level to materialize before the subtraction
        out = []
        rem = B
        for _ in range(nparts - 1):
            p = rem.astype(jnp.bfloat16)
            out.append(p)
            rem = rem - jax.lax.optimization_barrier(p).astype(
                jnp.float32)
        out.append(rem.astype(jnp.bfloat16))
        return jnp.concatenate(out, axis=1)

    return conv(jnp.asarray(blocks, jnp.float32), parts)


def _rect_mv_pair(blocks2, bases, w, nrows, ncl_pad, x, hi_only, bs):
    """:func:`_rect_mv` over a :func:`_pair_stack`-ed factor (2 or 3
    bf16 levels, row-stacked).

    ``hi_only``: stream just the bf16 hi rows (1/parts of the stored
    bytes — the predictor's form); otherwise one einsum over the full
    stack and a row fold (16/24-bit grade, for the refine
    application)."""
    nparts = blocks2.shape[1] // bs
    xpad = jnp.pad(x, (0, ncl_pad - x.shape[0]))
    xw = jnp.stack([jax.lax.slice(xpad, (b,), (b + w,)) for b in bases])
    if hi_only:
        y = jnp.einsum("kij,kj->ki", blocks2[:, :bs], xw,
                       precision=_BAND_PREC,
                       preferred_element_type=jnp.float32)
        return y.reshape(-1)[:nrows]
    y2 = jnp.einsum("kij,kj->ki", blocks2, xw, precision=_BAND_PREC,
                    preferred_element_type=jnp.float32)
    y = sum(y2[:, p * bs:(p + 1) * bs] for p in range(nparts))
    return y.reshape(-1)[:nrows]


@jax.tree_util.register_pytree_node_class
class SchurSaddleSolver:
    """Block-Schur saddle solver: exact dense Schur factors seeded by ONE
    host sparse LU, plus a fixed-iteration Jacobi-PCG velocity solve.

    For the time-step saddle ``[[F, J^T],[J, 0]]`` with SPD
    ``F = M + theta dt A`` (mass-dominated at CFL-scale dt):

    * setup (host, seconds): ``splu(F)``; ``X = F^{-1} J^T`` (np sparse
      backsolves — np << nv); ``S = J X`` and its dense inverse (np^2).
      No O(nv^2) object is ever formed — this is the path past the
      ~20k-dof ceiling of the dense-inverse solver.
    * per solve (device): ``y ~= F^{-1} rhs_v`` by ``ncg`` Jacobi-PCG
      iterations (F is spectrally close to the mass matrix, cond ~ 10-30,
      so a FIXED small iteration count reaches f32 accuracy — static
      control flow, scan/jit-friendly); then exactly
      ``q = S^{-1}(J y - rhs_p)`` and ``v = y - X q`` (two MXU matvecs).

    Replaces the reference's one-LU-many-backsolves property
    (time_int_utils.py:89-91) without any triangular solves, which do
    not map onto a systolic array.
    """

    # the X factor is stored TRANSPOSED (``XT (np_pad, nv)``): the apply
    # is a row-vector x matrix MXU pass either way, and the transposed
    # layout lets the device build assemble column chunks in place
    # (buffer donation) instead of a 2x-X concatenate/embed transient
    # that exhausts HBM at lvl3 (113k dofs: X alone is 5.5 GB)
    _leaf_names = ("XT", "Sinv", "dinv", "Kop", "Jop", "F_ell",
                   "J_ell", "JT_ell", "Bblk", "permf", "dinv_b",
                   "Jb", "JTb", "pidx", "Xb", "Eblk", "Wb")
    _aux_names = ("nv", "np", "ncg", "dtype", "refine",
                  "_bs", "_nblk", "_nin",
                  "_bsp", "_nblkp", "_wj", "_jbases", "_ncolpad_j",
                  "_wjt", "_jtbases", "_ncolpad_jt",
                  "_wx", "_xbases", "_ncolpad_x",
                  "_ww", "_wbases", "_ncolpad_w")

    def __init__(self, coeff=None, jmat=None, jmatT=None, res_ops=None,
                 dtype=None, ncg=None, cg_tol=None, refine=None,
                 full_map=None, setup="auto", banded="auto",
                 band_extra=None, index_nvals=None, winv=None,
                 _leaves=None, _aux=None):
        """``full_map=(invinds, nv_full)`` builds the solver over the
        FULL velocity dof set (the fast state layout): X rows and the
        Jacobi diagonal are zero-padded onto the bc dofs — the zero
        ``dinv`` entries mask the bc-row garbage of unconstrained
        element matvecs inside the PCG and pin the bc increments to
        zero.  ``res_ops`` must then be full-dof views.

        ``setup``: 'host' seeds X/S from one sparse ``splu`` (exact, but
        np single-core backsolves — ~5 min at lvl3); 'device' builds both
        factors on the accelerator via blocked Jacobi-PCG
        (:func:`_build_schur_factors_device`, seconds); 'auto' picks
        'device' on an accelerator backend once the host cost bites
        (within the ~16k-row device-LU ceiling for the S inversion)."""
        if _leaves is not None:
            for n, v in zip(self._leaf_names, _leaves):
                setattr(self, n, v)
            for n, v in zip(self._aux_names, _aux):
                setattr(self, n, v)
            return
        dtype = dtype or jnp.float32
        self.dtype = dtype
        F = sps.csc_matrix(coeff)
        J = sps.csr_matrix(jmat)
        jT = sps.csc_matrix(J.T if jmatT is None else jmatT)
        nv, npp = F.shape[0], J.shape[0]
        self.nv, self.np = nv, npp

        dv = F.diagonal()
        if ncg is None:
            # count host Jacobi-PCG iterations to the work-precision
            # tolerance once, then freeze (static loop bound on device)
            if cg_tol is None:
                cg_tol = 1e-7 if dtype == jnp.float32 else 1e-13
            rng = np.random.default_rng(0)
            b = rng.standard_normal(nv)
            it = [0]

            def cb(_):
                it[0] += 1

            spsla.cg(F, b, rtol=cg_tol, atol=0.0, maxiter=400,
                     M=sps.diags(1.0 / dv), callback=cb)
            ncg = it[0] + 3
        self.ncg = int(ncg)

        # BANDED mode: the whole solve runs in RCM-permuted space with
        # dense-block banded forms of F (block tridiagonal), J and J^T
        # (static-window rect blocks) — every application is slices +
        # ONE batched MXU matmul, no element gather/scatter (the
        # TPU-hostile ops: element forms cost ~10-40x at lvl2+,
        # docs/PERF_NOTES.md).  S^-1 and X^T are built directly in the
        # permuted layout; the only translations are the rhs gather at
        # entry and the solution scatter at exit.
        self.Bblk = self.permf = self.dinv_b = None
        self.Jb = self.JTb = self.pidx = self.Xb = self.Eblk = None
        self.Wb = None
        self._bs = self._nblk = self._nin = 0
        self._bsp = self._nblkp = 0
        self._wj = self._ncolpad_j = self._wjt = self._ncolpad_jt = 0
        self._jbases = self._jtbases = ()
        self._wx = self._ncolpad_x = 0
        self._xbases = ()
        self._ww = self._ncolpad_w = 0
        self._wbases = ()
        if banded == "auto":
            banded = _os.environ.get("DNS_TPU_BANDED", "1") != "0"
            if banded:
                # 3D / badly-ordered meshes: the RCM bandwidth scales
                # ~n^(2/3), so the block-tridiagonal storage can exceed
                # HBM — and before that, the per-application HBM stream
                # can exceed the element pipeline's cost (the 3D-1Z
                # 50.6k-dof band is 2.9 GB = ~4.8 ms/matvec vs ~2.3 ms
                # element).  Gate on BOTH: the absolute cap and the
                # stream-vs-element cost model (docs/PERF_NOTES.md
                # section 8, same form as the banded-conv-tail gate).
                from ..ops.banded_conv import (
                    banded_stream_us, banded_wins, index_pipeline_us,
                )

                cap = float(_os.environ.get("DNS_TPU_BANDED_MAXGB", "3"))
                est = _banded_bandwidth_gb(F)
                # shared cost model (ops/banded_conv.py module head);
                # ``index_nvals`` (nc*nd, from callers that know the
                # element tables) is the true scaling variable of the
                # element pipeline — the dof-count fallback assumes the
                # 2D-P2 vals/dof ratio
                if est > cap or not banded_wins(
                        est * 1e9, nvals=index_nvals,
                        ndofs=F.shape[0]):
                    import logging

                    logging.getLogger(__name__).info(
                        "banded F band %.2f GB (~%.0f us/apply) vs cap "
                        "%.1f GB / element ~%.0f us; using the "
                        "element-pipeline Schur path", est,
                        banded_stream_us(est * 1e9), cap,
                        index_pipeline_us(nvals=index_nvals,
                                          ndofs=F.shape[0]))
                    banded = False
        perm = pp = None
        if banded:
            blocks, perm, bs, nblk = _build_banded(F)
            pf = (perm if full_map is None
                  else np.asarray(full_map[0])[perm])
            self.Bblk = jnp.asarray(blocks)
            if band_extra is not None:
                # companion banded operator for the EXPLICIT part of the
                # time step (conv/A split: the diffusion matvec rides
                # this instead of the element pipeline — a banded
                # application costs ~1/10 of the element form at lvl2+,
                # docs/PERF_NOTES.md section 8).  Same perm/window as F:
                # band_extra's sparsity must be contained in F's
                # (F = M + theta dt band_extra guarantees it).
                Ep = sps.csr_matrix(
                    sps.csr_matrix(band_extra)[perm][:, perm])
                eco = Ep.tocoo()
                if eco.nnz and int(np.abs(eco.row - eco.col).max()) > bs:
                    raise ValueError("band_extra exceeds F's band window")
                self.Eblk = jnp.asarray(
                    _fold_banded_blocks(Ep, F.shape[0], bs, nblk))
            self.permf = jnp.asarray(pf, jnp.int32)
            self.dinv_b = jnp.asarray((1.0 / dv)[perm], dtype)
            self._bs, self._nblk, self._nin = int(bs), int(nblk), F.shape[0]
            # pressure order: sort J's rows by the mean RCM position of
            # their velocity couplings — J / J^T then band under the
            # (pp, perm) orders like F does under (perm, perm)
            ipos = np.empty(nv, np.int64)
            ipos[perm] = np.arange(nv)
            Jcsr = sps.csr_matrix(J)
            mpos = np.zeros(npp)
            for i in range(npp):
                s0, e0 = Jcsr.indptr[i], Jcsr.indptr[i + 1]
                if e0 > s0:
                    mpos[i] = ipos[Jcsr.indices[s0:e0]].mean()
            pp = np.argsort(mpos, kind="stable")
            self.pidx = jnp.asarray(pp, jnp.int32)
            bsp = 128
            jb, jbases, wj, njpad = _build_banded_rect(J, pp, perm, bsp)
            self.Jb = jnp.asarray(jb)
            self._bsp, self._nblkp = bsp, int(jb.shape[0])
            self._wj, self._jbases, self._ncolpad_j = (
                int(wj), jbases, int(njpad))
            jtb, jtbases, wjt, njtpad = _build_banded_rect(
                jT, perm, pp, bs)
            self.JTb = jnp.asarray(jtb)
            self._wjt, self._jtbases, self._ncolpad_jt = (
                int(wjt), jtbases, int(njtpad))
            # banded X: F = M + theta dt A is mass-dominated at
            # CFL-scale dt, so F^{-1} decays EXPONENTIALLY off the
            # diagonal and X = F^{-1} J^T is banded to the f32 floor
            # within a few F-bandwidths (measured: max column
            # truncation 3.6e-7 at +-4bs on lvl1, 2.9e-6 at +-5bs on
            # lvl2, docs/PERF_NOTES.md) — 12x fewer bytes than dense
            # X at lvl3 (0.45 GB vs 5.3 GB), which is the step's
            # largest HBM read.  The window is measured by PROBING a
            # few exact columns of X with host CG (the decay rate
            # depends on dt nu / h^2, so a fixed factor misjudges
            # off-CFL steps); DNS_TPU_XBAND_K floors the margin.
            kdec = int(_os.environ.get("DNS_TPU_XBAND_K", "4"))
            ncols_probe = min(8, npp)
            pcols = np.unique(np.linspace(0, npp - 1,
                                          ncols_probe).astype(int))
            jTc = sps.csc_matrix(jT)
            Mdiag = sps.diags(1.0 / dv)
            ipos_v = np.empty(nv, np.int64)
            ipos_v[perm] = np.arange(nv)
            hw = 0
            for c in pcols:
                col = np.asarray(
                    jTc[:, int(pp[c])].todense()).ravel()
                xc, _ = spsla.cg(F, col, rtol=1e-10, atol=0.0,
                                 maxiter=400, M=Mdiag)
                xn = np.abs(xc[perm])
                big = np.nonzero(xn > 1e-7 * xn.max())[0]
                if len(big):
                    hw = max(hw, int(np.abs(big - mpos[pp[c]]).max()))
            # probes sample the decay; 1.5x margin + K*bs floor covers
            # unprobed columns (the host path verifies and warns; the
            # increment-form refine rounds absorb residual truncation)
            wx = int(3 * hw) * npp // nv + wjt + 2 * kdec * bs * npp // nv
            wx = min(int(np.ceil(wx / 128)) * 128, njtpad)
            xbases = tuple(
                min(max(b + (wjt - wx) // 2, 0), njtpad - wx)
                for b in jtbases)
            self._wx, self._xbases, self._ncolpad_x = (
                int(wx), xbases, int(njtpad))
            # banded truncated inverse W ~ F^{-1}: the same exponential
            # decay that bands X bands F^{-1} itself, so ONE wide banded
            # matvec replaces the whole fixed-count Jacobi-PCG — ~2x
            # fewer HBM bytes per solve than 6 iterations x the F band
            # and no sequential iteration dependencies.  The truncation
            # tolerance defaults LOOSE (3e-3): one warm-started refine
            # round absorbs even that truncation to the mesh's f32
            # trajectory floor (1.4e-7 at lvl2, measured both at 1e-5
            # and 3e-3 — tools/probe_wtol.py, PERF_NOTES section 14),
            # while the window ww ~ log(1/wtol) shrinkage buys +41%
            # steps/s and halves the W build (the lvl3 setup
            # bottleneck).  Unrefined (warm_refine=0) callers imprint
            # ~wtol on the O(dt) increments — tighten DNS_TPU_WINV_TOL
            # if running fast-mode with accuracy needs.  Window measured
            # by probing exact F^{-1} columns with host CG (like X's);
            # docs/PERF_NOTES.md section 12.
            # explicit ``winv`` argument wins over the env knob (the
            # env-var toggle is process-wide and racy for concurrent
            # builds — callers like the steady pseudotime init pass
            # winv=False instead of mutating os.environ)
            if winv is not None:
                wmode = "1" if winv else "0"
            else:
                wmode = _os.environ.get("DNS_TPU_WINV", "auto")
            if wmode == "auto":
                # the round-3 crossover (PCG wins below ~120 MB F band
                # because the band stays VMEM-resident across
                # iterations) was re-measured 2026-08-21 with the
                # tri-level bf16 W: the hi-only predictor streams 1/6
                # of the old f32 W bytes and W now wins at lvl1 too
                # (2039 vs 1836 refined steps/s, rel 1.7e-7 vs 5.7e-8
                # — both far under the refine floor).  Keep the PCG
                # only for tiny problems where the build isn't worth
                # its seconds.
                use_winv = (nv > 5000
                            or nblk * bs * 3 * bs * 4 > 1.2e8)
            else:
                use_winv = wmode != "0"
            if use_winv and not (jax.default_backend() == "cpu"
                                 and nv > 4000):
                wtol = float(_os.environ.get("DNS_TPU_WINV_TOL", "3e-3"))
                rngw = np.random.default_rng(1)
                hwf = 0
                for j in rngw.choice(nv, min(8, nv), replace=False):
                    e = np.zeros(nv)
                    e[j] = 1.0
                    xc, _ = spsla.cg(F, e, rtol=1e-10, atol=0.0,
                                     maxiter=400, M=Mdiag)
                    xn = np.abs(xc[perm])
                    big = np.nonzero(xn > wtol * xn.max())[0]
                    if len(big):
                        hwf = max(hwf, int(np.abs(big - ipos_v[j]).max()))
                ww = bs + 2 * int(np.ceil(1.3 * hwf))
                ww = min(int(np.ceil(ww / 128)) * 128, max(nv, 128))
                wcap = float(_os.environ.get("DNS_TPU_WINV_MAXGB", "4"))
                if nblk * bs * ww * 4 <= wcap * 1e9:
                    ncpw = max(nv, ww)
                    self._ww, self._ncolpad_w = int(ww), int(ncpw)
                    self._wbases = tuple(
                        min(max(k * bs + (bs - ww) // 2, 0), ncpw - ww)
                        for k in range(nblk))

        on_dev = jax.default_backend() != "cpu"
        if setup == "auto":
            setup = ("device" if on_dev and npp <= 16000
                     and (nv > 12000 or npp > 1500) else "host")

        if setup == "device":
            if full_map is not None:
                self.nv = full_map[1]
            if banded:
                # factors built directly in permuted layout: permuted
                # pressure rows via J/J^T reordered on host, permuted
                # X^T columns via the builder's colmap
                J = sps.csr_matrix(J)[pp]
                jT = sps.csc_matrix(jT)[:, pp]
                cmap = np.argsort(perm).astype(np.int32)
            else:
                cmap = (None if full_map is None
                        else np.asarray(full_map[0]))
            # ORDER matters for peak HBM at lvl3+: build + invert S
            # while nothing big is alive, THEN build the (multi-GB) X^T
            # — the block inversion's call-local scratch (~8 GB at
            # np=13k) and X^T must never coexist (docs: the axon result
            # cache retains call outputs, so staging is the memory tool)
            _, S = _build_schur_factors_device(
                F, J, jT, 1.0 / dv, self.ncg,
                out_cols=nv if banded else self.nv,
                colmap=cmap, want="S")
            hi, lo = _equilibrate_inv_staged(S, 2)
            _delete_buffers(S)

            @jax.jit
            def _flush_stack(hi, lo):
                flush = jnp.float32(1.2e-38)
                hi = jnp.where(jnp.abs(hi) < flush, jnp.float32(0), hi)
                lo = jnp.where(jnp.abs(lo) < flush, jnp.float32(0), lo)
                return jnp.concatenate([hi, lo], axis=0)

            self.Sinv = _flush_stack(hi, lo)
            self.Sinv.block_until_ready()
            _delete_buffers(hi, lo)
            XT, _ = _build_schur_factors_device(
                F, J, jT, 1.0 / dv, self.ncg,
                out_cols=nv if banded else self.nv,
                colmap=cmap, want="X")
            if banded:
                parts = XT if isinstance(XT, tuple) else (XT,)
                self.Xb = _xt_parts_to_banded(
                    parts, self._xbases, self._bs, self._nblk,
                    self._wx, nv)
                self.Xb.block_until_ready()
                _delete_buffers(*parts)
                self.XT = None
            else:
                self.XT = (tuple(p.astype(dtype) for p in XT)
                           if isinstance(XT, tuple) else XT.astype(dtype))
        else:
            lu = spsla.splu(F)
            if banded:
                # factors in permuted layout: pp pressure rows, RCM
                # velocity columns (inner size — no bc zero-padding; the
                # permuted core never sees the full dof set); X stored
                # BANDED (exact to the f32 floor, see the window note in
                # the banded init block)
                X = lu.solve(np.asarray(
                    sps.csc_matrix(jT)[:, pp].todense()))    # (nv, np)
                S = np.asarray(sps.csr_matrix(J)[pp] @ X)
                Xp = np.asarray(X, np.float32)[perm]
                xb = np.zeros((self._nblk, self._bs, self._wx),
                              np.float32)
                for kb, b in enumerate(self._xbases):
                    r0 = kb * self._bs
                    sub = Xp[r0: min(r0 + self._bs, nv),
                             b: min(b + self._wx, npp)]
                    xb[kb, : sub.shape[0], : sub.shape[1]] = sub
                # f64 accumulation: the two sums are nearly equal and
                # f32 accumulation noise (~sqrt(eps)) would read as a
                # spurious 3e-4 "truncation"
                tot = float((Xp.astype(np.float64) ** 2).sum()) or 1.0
                kept = float((xb.astype(np.float64) ** 2).sum())
                trunc = np.sqrt(max(tot - kept, 0.0) / tot)
                if trunc > 1e-4:
                    import warnings

                    warnings.warn(
                        f"banded-X truncation {trunc:.1e} above 1e-4; "
                        "raise DNS_TPU_XBAND_K")
                self.Xb = jnp.asarray(xb)
                self.XT = None
                if full_map is not None:
                    self.nv = full_map[1]
            else:
                X = lu.solve(np.asarray(jT.todense()))       # (nv, np)
                S = np.asarray(J @ X)                        # (np,np), SPD
                if full_map is not None:
                    invinds, nv_full = full_map
                    XTf = np.zeros((npp, nv_full))
                    XTf[:, np.asarray(invinds)] = X.T
                    self.nv = nv_full
                    self.XT = jnp.asarray(XTf, dtype)
                else:
                    self.XT = jnp.asarray(np.ascontiguousarray(X.T),
                                          dtype)
            use_device_sinv = npp > 3000 and on_dev
            if use_device_sinv:
                # single-core host inv(np^3) takes minutes at lvl2+; the
                # equilibrated f32 device inverse + Newton-Schulz takes
                # <1 s.  The hi/lo double-f32 pair is STACKED into one
                # (2np, np) operator: a single f32 inverse only solves to
                # kappa(S)*1e-7 (6.6e-3 measured at lvl3), and applying
                # the parts as two separate matvecs trips a ~15x axon
                # scan scheduling cliff.
                try:
                    hi, lo = _device_dense_inverse(S)
                    self.Sinv = jnp.concatenate([hi, lo], axis=0)
                except Exception:
                    # the device LU blocks overflow VMEM beyond ~16k rows
                    # (seen at np=17135/lvl4) — fall back to the slow
                    # host f64 inversion + hi/lo split
                    use_device_sinv = False
            if use_device_sinv:
                pass
            elif dtype == jnp.float32:
                Sinv64 = np.linalg.inv(S)
                hi = np.asarray(Sinv64, np.float32)
                lo = np.asarray(Sinv64 - np.asarray(hi, np.float64),
                                np.float32)
                self.Sinv = jnp.asarray(np.concatenate([hi, lo], axis=0))
            else:
                self.Sinv = jnp.asarray(np.linalg.inv(S), dtype)
        if banded and self._ww:
            # column accuracy only needs the TRUNCATION tolerance (the
            # band cut dominates W's error): count host PCG iterations
            # to wtol once — ~2/3 of the 1e-7-grade count, a real cut
            # at lvl3's 97k-column build
            rngn = np.random.default_rng(2)
            itw = [0]
            spsla.cg(F, rngn.standard_normal(nv), rtol=wtol, atol=0.0,
                     maxiter=400, M=Mdiag,
                     callback=lambda _: itw.__setitem__(
                         0, itw[0] + 1))
            niter_w = itw[0] + 3
        if (banded and self._ww and _os.environ.get(
                "DNS_TPU_WINV_BUILD", "auto") not in ("global",)):
            # localized banded build: each bs-column identity chunk is
            # solved on a ww+4bs-row local window with the banded
            # matvec (docstring of :func:`_build_winv_banded`) — ~10x
            # the global ELL build's speed at lvl3 (the round-3 W-build
            # setup bottleneck, docs/PERF_NOTES.md section 12).
            # RESILIENCE (VERDICT r4 #4): on the 2026-08-20 tunnel the
            # IN-PROCESS build at lvl3 shapes (bs=896, ww=6144)
            # reproducibly dies with "TPU device error" — a
            # process-context trigger that poisons later dispatches
            # (PERF_NOTES 18.2).  At risky shapes ('auto' past
            # DNS_TPU_WINV_SUBPROC_GB, default 1 GB of W blocks) the
            # build therefore runs in a THROWAWAY subprocess with its
            # own clean TPU client (_build_winv_banded_subproc) so a
            # build abort can never touch this process; small shapes
            # keep the zero-overhead in-process build, and an
            # in-process failure still retries via the subprocess
            # before falling back to the W-less banded path
            # (fixed-count PCG on the exact banded F, ~2x step cost).
            bmode = _os.environ.get("DNS_TPU_WINV_BUILD", "auto")
            wgb = float(_os.environ.get("DNS_TPU_WINV_SUBPROC_GB",
                                        "1.0"))
            risky = (jax.default_backend() != "cpu"
                     and nblk * bs * self._ww * 4 > wgb * 1e9)
            use_sub = (bmode == "subproc"
                       or (bmode == "auto" and risky))
            import logging

            _wlog = logging.getLogger(__name__)

            def _sub():
                return jnp.asarray(_build_winv_banded_subproc(
                    blocks, (1.0 / dv)[perm], self._bs, self._nblk,
                    nv, self._wbases, self._ww, niter_w))

            try:
                if use_sub:
                    self.Wb = _sub()
                else:
                    self.Wb = _build_winv_banded(
                        self.Bblk, (1.0 / dv)[perm], self._bs,
                        self._nblk, nv, self._wbases, self._ww,
                        niter_w)
            except Exception as e:           # jax runtime errors vary
                self.Wb = None
                if not use_sub:
                    _wlog.warning(
                        "in-process banded W build failed (%s); "
                        "retrying in a throwaway subprocess",
                        repr(e)[:120])
                    try:
                        self.Wb = _sub()
                    except Exception as e2:
                        e = e2
                if self.Wb is None:
                    _wlog.warning(
                        "banded W build failed on this runtime (%s); "
                        "falling back to PCG-on-banded-F",
                        repr(e)[:120])
        elif banded and self._ww:
            # GLOBAL build (DNS_TPU_WINV_BUILD=global): chunked device
            # Jacobi-PCG on identity columns in PERMUTED order (the X
            # machinery), folded group-wise into the static-window
            # block form — the dense W would be nv^2 and cannot be
            # materialized at once.
            cmapw = np.argsort(perm).astype(np.int32)
            I_csc = sps.identity(nv, format="csc", dtype=np.float64)
            Wb = None
            gs = 8192
            for lo in range(0, nv, gs):
                hi = min(lo + gs, nv)
                part, _ = _build_schur_factors_device(
                    F, J, I_csc[:, perm[lo:hi]], 1.0 / dv, self.ncg,
                    chunk=512, out_cols=nv, colmap=cmapw, want="X",
                    niter=niter_w)
                parts = part if isinstance(part, tuple) else (part,)
                off = lo
                for p in parts:
                    pe = min(int(p.shape[0]), hi - off)
                    if pe <= 0:
                        break
                    pw = p if pe == int(p.shape[0]) else p[:pe]
                    Wb = _xt_parts_to_banded(
                        (pw,), self._wbases, self._bs, self._nblk,
                        self._ww, nv, start=off, out=Wb)
                    off += pe
                Wb.block_until_ready()
                _delete_buffers(*parts)
            self.Wb = Wb
        if (self.Wb is not None and jax.default_backend() != "cpu"
                and _os.environ.get("DNS_TPU_WINV_BF16", "0") == "1"):
            # legacy knob (superseded by DNS_TPU_LOWBIT's hi/lo pairs):
            # single-bf16 W halves the stream but imprints ~4e-3 on the
            # one-shot solve; refine=2 restores the floor at ~1.5x the
            # f32-W refine=1 stream (tools/probe_wtol.py --bf16).
            self.Wb = self.Wb.astype(jnp.bfloat16)

        # LOW-BIT FACTOR STORAGE (VERDICT r4 #2 — lvl2 streams 1.9
        # GB/step at 82% of HBM peak; bytes are the only lever left):
        # bf16 is the MXU's native operand, measured 2.4x per
        # application over the same f32 blocks (tools/probe_lowbit.py;
        # int16/f16 converts do not fuse).  The SOLVE factors W/X
        # become hi/lo bf16 row-pairs (_pair_stack): the predictor
        # streams the hi rows alone (half the f32 bytes, ~4e-3
        # rounding), the refine application streams the full pair (f32
        # bytes at bf16 speed, ~1.5e-5) — so with warm_refine>=1 the
        # trajectory floor stays at the window-truncation level (the
        # measured 1.4e-7 lvl2 regime), unlike the legacy single-bf16
        # W whose refine=1 floor was 4.3e-6 (PERF_NOTES section 14).
        # S^-1's existing f32 hi/lo stack becomes a bf16 hi/lo stack
        # (4x fewer bytes; ~1.5e-5, absorbed like W's truncation).
        # Residual/rhs operators (banded F, J, J^T, Eblk) stay f32 —
        # their noise enters the refine residual UNcontracted.
        # Default on accelerator backends; DNS_TPU_LOWBIT=0 opts out
        # (CPU keeps f32: bf16 there is emulated and slower).
        lb = _os.environ.get("DNS_TPU_LOWBIT", "auto")
        use_lb = (lb == "1" or (lb == "auto"
                                and jax.default_backend() != "cpu"))
        if use_lb and banded and dtype == jnp.float32:
            # measured per-factor refine floors at lvl2 with 16-bit
            # pairs: W 6.9e-7, X 2.3e-7, S^-1 8.8e-7 — summing past
            # 1e-6.  W and S^-1 therefore carry THREE bf16 levels
            # (~f32-grade refine stream at 1.5x f32 bytes, predictor
            # still hi-only); X's pair floor is already at the f32
            # level, it stays 2-level.
            if self.Wb is not None and self.Wb.dtype == jnp.float32:
                self.Wb = _pair_stack(self.Wb, parts=3)
            if self.Xb is not None and self.Xb.dtype == jnp.float32:
                self.Xb = _pair_stack(self.Xb, parts=2)
            if (self.Sinv is not None
                    and self.Sinv.shape[0] == 2 * npp
                    and self.Sinv.dtype == jnp.float32):

                @jax.jit
                def _sinv_tri(S):
                    hi, lo = S[:npp], S[npp:]
                    s1 = hi.astype(jnp.bfloat16)
                    # barriers: see _pair_stack — without them XLA
                    # folds the bf16 roundtrips and the residual
                    # levels collapse
                    r1 = hi - jax.lax.optimization_barrier(
                        s1).astype(jnp.float32)
                    s2 = (r1 + lo).astype(jnp.bfloat16)
                    r2 = ((r1 - jax.lax.optimization_barrier(
                        s2).astype(jnp.float32)) + lo)
                    s3 = r2.astype(jnp.bfloat16)
                    return jnp.concatenate([s1, s2, s3], axis=0)

                self.Sinv = _sinv_tri(self.Sinv)

        if full_map is not None:
            dinvf = np.zeros(self.nv)
            dinvf[np.asarray(full_map[0])] = 1.0 / dv
            self.dinv = jnp.asarray(dinvf, dtype)
            if res_ops is None and not banded:
                raise ValueError("full_map requires full-dof res_ops")
        else:
            self.dinv = jnp.asarray(1.0 / dv, dtype)

        if res_ops is not None:
            self.Kop, self.Jop = res_ops
            self.F_ell = self.J_ell = self.JT_ell = None
        elif banded:
            # the banded forms cover every application (incl. refine
            # residuals); no element/ELL fallbacks needed.  NOTE: J/jT
            # may have been permuted above — do not reuse them here.
            self.Kop = self.Jop = None
            self.F_ell = self.J_ell = self.JT_ell = None
        else:
            from ..ops.sparse import ell_from_scipy_fast

            self.Kop = self.Jop = None
            self.F_ell = ell_from_scipy_fast(F, dtype=dtype)
            self.J_ell = ell_from_scipy_fast(J, dtype=dtype)
            self.JT_ell = ell_from_scipy_fast(jT, dtype=dtype)

        if refine is None:
            # refine stays 0 HERE because the time integrators pass
            # warm_refine per solve_warm call (the production knob):
            # one warm-started residual round recovers work-precision
            # solves from the f32 factors (lvl2 trajectory 1.4e-7).
            # The round-2 "refine costs 28x in-scan" anomaly was
            # root-caused as a per-application latency floor of the old
            # tunnel runtime and is gone on the current toolchain
            # (docs/PERF_NOTES.md sections 8-10).  Increment-form
            # stepping from smooth starts tolerates refine=0 (errors
            # scale with the O(dt) increments).
            refine = 0
        self.refine = int(refine)

    def tree_flatten(self):
        return (tuple(getattr(self, n) for n in self._leaf_names),
                tuple(getattr(self, n) for n in self._aux_names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def _fmv(self, x):
        if self.Kop is not None:
            return self.Kop.matvec(x)
        return self.F_ell.matvec(x)

    def _jmv(self, x):
        if self.Jop is not None:
            return self.Jop.matvec(x)
        return self.J_ell.matvec(x)

    def _fsolve(self, b, x0=None, niter=None):
        """Jacobi-PCG with a static iteration count (warm-startable).

        With the RCM-banded factor the iterations run entirely in
        permuted inner space: the only gathers are the rhs/warm-start
        translation at entry and the scatter back at exit."""
        if self.Bblk is not None:
            bp = b[self.permf].astype(self.dtype)
            x0p = None if x0 is None else x0[self.permf].astype(self.dtype)

            def fmv(xp):
                return _banded_mv(self.Bblk, xp, self._bs, self._nblk,
                                  self._nin)

            yp = jacobi_pcg(fmv, self.dinv_b, bp, niter or self.ncg,
                            x0=x0p)
            return jnp.zeros((self.nv,), yp.dtype).at[self.permf].set(yp)
        return jacobi_pcg(self._fmv, self.dinv, b, niter or self.ncg,
                          x0=x0)

    def _jtmv(self, q):
        if self.Jop is not None:
            return self.Jop.rmatvec(q)
        return self.JT_ell.matvec(q)

    def _sapply(self, g):
        # the double-f32 hi/lo pair rides ONE stacked matmul (adding a
        # second separate matvec to the scan body trips a ~15x axon
        # scheduling cliff, like a second PCG loop does); under
        # low-bit storage the stack is 3 bf16 levels (~f32 grade)
        q2 = self.Sinv @ g
        nparts = self.Sinv.shape[0] // self.np
        if nparts > 1:
            return sum(q2[p * self.np:(p + 1) * self.np]
                       for p in range(nparts))
        return q2

    def _xapply(self, q, hi_only=False):
        """``X @ q`` via the transposed factor (one MXU vecmat per
        row-part; multi-GB factors are stored as ROW-PARTS because the
        full-size concatenate peaks at 2x X during setup — lvl3 OOM).
        Banded mode: X is stored banded (exact to the f32 floor) —
        static window slices + one batched matmul; under low-bit
        storage it is a bf16 hi/lo row-pair like W (see _wapply)."""
        if self.Xb is not None:
            if self.Xb.shape[1] > self._bs:
                return _rect_mv_pair(self.Xb, self._xbases, self._wx,
                                     self._nin, self._ncolpad_x, q,
                                     hi_only, self._bs)
            return _rect_mv(self.Xb, self._xbases, self._wx, self._nin,
                            self._ncolpad_x, q)
        parts = self.XT if isinstance(self.XT, tuple) else (self.XT,)
        npad = sum(p.shape[0] for p in parts)
        if npad != self.np:
            q = jnp.zeros((npad,), q.dtype).at[: self.np].set(q)
        y = None
        lo = 0
        for p in parts:
            contrib = q[lo: lo + p.shape[0]] @ p
            y = contrib if y is None else y + contrib
            lo += p.shape[0]
        return y

    # ---- permuted banded core: every application is slices + one
    # batched MXU matmul; no gathers inside (docs/PERF_NOTES.md) ----

    @property
    def warm_size(self):
        """Length of the warm-start vector ``y`` threaded through
        :meth:`solve_warm` (permuted inner size in banded mode)."""
        return self._nin if self.Bblk is not None else self.nv

    def _fmv_perm(self, xp):
        return _banded_mv(self.Bblk, xp, self._bs, self._nblk, self._nin)

    def _wapply(self, bp, hi_only=False):
        """``W @ bp``: the banded truncated inverse replaces the whole
        fixed-count PCG — one wide static-window matvec (~2x fewer HBM
        bytes than the iteration's F-band streams, no sequential
        dependencies, solve tolerance = the truncation threshold).
        Under low-bit storage the factor is a bf16 hi/lo row-pair:
        ``hi_only`` streams half the bytes (predictor), the pair is
        f32-grade (refine)."""
        if self.Wb.shape[1] > self._bs:
            return _rect_mv_pair(self.Wb, self._wbases, self._ww,
                                 self._nin, self._ncolpad_w, bp,
                                 hi_only, self._bs)
        return _rect_mv(self.Wb, self._wbases, self._ww, self._nin,
                        self._ncolpad_w, bp)

    def band_extra_mv(self, xp):
        """``band_extra_perm @ xp`` (permuted inner space) — the explicit
        operator registered at construction (conv/A split)."""
        return _banded_mv(self.Eblk, xp.astype(self.dtype), self._bs,
                          self._nblk, self._nin)

    def _jmv_perm(self, xp):
        return _rect_mv(self.Jb, self._jbases, self._wj, self.np,
                        self._ncolpad_j, xp)

    def _jtmv_perm(self, qp):
        return _rect_mv(self.JTb, self._jtbases, self._wjt, self._nin,
                        self._ncolpad_jt, qp)

    def _solve_core_perm(self, bvp, bpp, y0p=None, niter=None,
                         refine=0, niter_ref=None):
        """All-permuted solve: rhs/solution in RCM velocity order and
        pp pressure order.  Returns ``(v_perm, q_perm, y_perm)``.

        With the banded truncated inverse W (``Wb``) the velocity-block
        solves are direct wide banded matvecs (warm starts unused); the
        refine residuals always use the EXACT banded F, so W/X
        truncation is absorbed quadratically per round."""
        # asymmetric low-bit schedule: the PREDICTOR streams the bf16
        # hi rows of W/X alone when a refine round follows (its ~4e-3
        # rounding is corrected like the window truncation); with NO
        # refine the full pair keeps the one-shot solve at f32 grade.
        # W-LESS caveat (measured lvl1: refined trajectory 2.2e-6 vs
        # 5.7e-8): the PCG refine only solves to ~2e-4, which cannot
        # absorb a 4e-3-crude predictor — hi-only needs the W path's
        # truncation-grade refine behind it
        hi_only = refine > 0 and self.Wb is not None
        if self.Wb is not None:
            y = self._wapply(bvp, hi_only=hi_only)
        else:
            y = jacobi_pcg(self._fmv_perm, self.dinv_b, bvp,
                           niter or self.ncg, x0=y0p)
        q = self._sapply(self._jmv_perm(y) - bpp)
        v = y - self._xapply(q, hi_only=hi_only)
        for _ in range(refine):
            rv = bvp - (self._fmv_perm(v) + self._jtmv_perm(q))
            rp = bpp - self._jmv_perm(v)
            # scale the correction to O(1) (f32 denormal stall on TPU)
            s = jnp.sqrt(jnp.mean(rv * rv) + jnp.mean(rp * rp)
                         + jnp.asarray(1e-30, rv.dtype))
            if self.Wb is not None:
                y2 = self._wapply(rv / s)
            else:
                y2 = jacobi_pcg(self._fmv_perm, self.dinv_b, rv / s,
                                niter_ref or niter or self.ncg)
            q2 = self._sapply(self._jmv_perm(y2) - rp / s)
            v = v + s * (y2 - self._xapply(q2))
            q = q + s * q2
        return v, q, y

    def solve_warm_wspace(self, rhs_w, bpp, y0, niter=None, refine=0,
                          niter_ref=None):
        """Warm solve for the PERMUTED state layout: ``rhs_w``'s first
        ``_nin`` entries ARE the permuted inner rhs (a slice, no
        gather), ``bpp`` is already pp-ordered.  Returns
        ``(dv_perm (nin,), q_pp (np,), y_perm)`` — the caller pads the
        increment onto its bc tail."""
        bvp = rhs_w[: self._nin].astype(self.dtype)
        v, q, y = self._solve_core_perm(
            bvp, bpp.astype(self.dtype), y0p=y0,
            niter=niter or self.ncg_warm, refine=refine,
            niter_ref=niter_ref)
        return v, q, y

    def _perm_in(self, rhsv, rhsp):
        bv = rhsv.reshape(-1).astype(self.dtype)
        bp = rhsp.reshape(-1).astype(self.dtype)
        return bv[self.permf], bp[self.pidx]

    def _perm_out(self, v, q):
        vo = jnp.zeros((self.nv,), v.dtype).at[self.permf].set(v)
        qo = jnp.zeros((self.np,), q.dtype).at[self.pidx].set(q)
        return jnp.concatenate([vo, qo])

    def _base_solve(self, bv, bp):
        y = self._fsolve(bv)
        q = self._sapply(self._jmv(y) - bp)
        v = y - self._xapply(q)
        return v, q

    def solve(self, rhsv, rhsp):
        """Raw stacked ``[v; q]`` like :class:`InverseSaddleSolver`."""
        if self.Bblk is not None:
            bvp, bpp = self._perm_in(rhsv, rhsp)
            v, q, _ = self._solve_core_perm(bvp, bpp, refine=self.refine)
            return self._perm_out(v, q)
        bv = rhsv.reshape(-1).astype(self.dtype)
        bp = rhsp.reshape(-1).astype(self.dtype)
        v, q = self._base_solve(bv, bp)
        for _ in range(self.refine):
            rv = bv - (self._fmv(v) + self._jtmv(q))
            rp = bp - self._jmv(v)
            # normalize the correction solve to O(1): the residual is
            # ~1e-7 of the rhs and the PCG's internal products would
            # sink into f32 denormals — a massive VPU slowdown on TPU
            s = jnp.sqrt(jnp.mean(rv * rv) + jnp.mean(rp * rp)
                         + jnp.asarray(1e-30, rv.dtype))
            dv, dq = self._base_solve(rv / s, rp / s)
            v = v + s * dv
            q = q + s * dq
        return jnp.concatenate([v, q])

    @property
    def ncg_warm(self):
        # warm starts begin O(dt) away in relative residual: two thirds
        # of the cold count holds the same tolerance in practice
        return max(6, (2 * self.ncg) // 3)

    def solve_warm(self, rhsv, rhsp, y0, niter=None, refine=0,
                   niter_ref=None):
        """Warm-started variant for time stepping: pass the previous
        step's velocity-block solve ``y`` (returned as the third field)
        or an extrapolation of the previous two — consecutive increment
        solves differ by O(dt) (an extrapolated start by O(dt^2)), so
        the PCG starts near the solution and needs far fewer
        iterations (``niter`` overrides the 2/3-of-cold default).

        ``refine`` appends that many SHORT residual-correction rounds
        (each: scaled residual -> ``niter_ref``-iteration cold PCG +
        Schur tail).  One round with ``niter_ref~niter`` roughly
        doubles the step cost and cuts the trajectory-error floor of
        the f32 Schur path by ~an order of magnitude (the floor is the
        in-step solve tolerance, docs/PERF_NOTES.md section 4.3).

        Banded mode: ``y0``/returned ``y`` live in PERMUTED inner space
        (length :attr:`warm_size`) — thread them opaquely."""
        if self.Bblk is not None:
            bvp, bpp = self._perm_in(rhsv, rhsp)
            v, q, y = self._solve_core_perm(
                bvp, bpp, y0p=y0, niter=niter or self.ncg_warm,
                refine=refine, niter_ref=niter_ref)
            return self._perm_out(v, q), y
        bv = rhsv.reshape(-1).astype(self.dtype)
        bp = rhsp.reshape(-1).astype(self.dtype)
        y = self._fsolve(bv, x0=y0, niter=niter or self.ncg_warm)
        q = self._sapply(self._jmv(y) - bp)
        v = y - self._xapply(q)
        for _ in range(refine):
            rv = bv - (self._fmv(v) + self._jtmv(q))
            rp = bp - self._jmv(v)
            # scale the correction to O(1) (f32 denormal stall on TPU)
            s = jnp.sqrt(jnp.mean(rv * rv) + jnp.mean(rp * rp)
                         + jnp.asarray(1e-30, rv.dtype))
            y2 = self._fsolve(rv / s, niter=niter_ref or niter
                              or self.ncg_warm)
            q2 = self._sapply(self._jmv(y2) - rp / s)
            v = v + s * (y2 - self._xapply(q2))
            q = q + s * q2
        return jnp.concatenate([v, q]), y


@jax.tree_util.register_pytree_node_class
class SMWSolver:
    """Wrap any reusable saddle solver with the implicit low-rank update
    ``A -> A - c * umat @ vmat`` via Sherman-Morrison-Woodbury.

    The base solves for the k update columns and the k-by-k capacitance
    inverse are precomputed ONCE; each wrapped solve costs the base solve
    plus two small dense matvecs — the property that lets static feedback
    ride the scan integrators (the reference supports feedback only in
    its per-step-LU implicit loop, stokes_navier_utils.py:1505-1512).
    """

    def __init__(self, base=None, umat=None, vmat=None, c=1.0,
                 _leaves=None, _aux=None):
        if _leaves is not None:
            (self.base, self.W, self.capinv, self.vmat) = _leaves
            (self.nv, self.np) = _aux
            return
        self.base = base
        self.nv, self.np = base.nv, base.np
        U = np.asarray(_to_dense(umat), dtype=np.float64)
        V = np.asarray(_to_dense(vmat), dtype=np.float64)
        k = U.shape[1]
        cols = []
        zp = jnp.zeros((self.np,))
        for i in range(k):
            cols.append(base.solve(jnp.asarray(c * U[:, i]), zp))
        W = jnp.stack(cols, axis=1)                      # (nv+np, k)
        cap = np.eye(k) - V @ np.asarray(W)[: self.nv]
        self.W = W
        self.capinv = jnp.asarray(np.linalg.inv(cap))
        self.vmat = jnp.asarray(V)

    def tree_flatten(self):
        return ((self.base, self.W, self.capinv, self.vmat),
                (self.nv, self.np))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(_leaves=children, _aux=aux)

    def solve(self, rhsv, rhsp):
        x0 = self.base.solve(rhsv, rhsp)
        coef = self.capinv @ (self.vmat @ x0[: self.nv])
        return x0 + self.W @ coef


def apply_massinv(massmat, rhsa, output=None):
    """``M^{-1} rhs`` — parity with ``lau.apply_massinv``
    (used e.g. in tests/time_dep_nse_bigchannel.py:33)."""
    rhs = np.asarray(_to_dense(rhsa))
    out = spsla.spsolve(sps.csc_matrix(massmat), rhs)
    return np.asarray(out).reshape(rhs.shape)


# ---------------------------------------------------------------------------
# host oracle / baseline
# ---------------------------------------------------------------------------

def host_saddle_factorized(amat, jmat, jmatT=None):
    """scipy ``splu``-backed reusable solver (baseline twin of the
    reference's ``spsla.factorized`` pattern, time_int_utils.py:89-91)."""
    nv = amat.shape[0]
    npp = jmat.shape[0]
    jT = jmat.T if jmatT is None else jmatT
    K = sps.vstack([
        sps.hstack([sps.csc_matrix(amat), sps.csc_matrix(jT)]),
        sps.hstack([sps.csc_matrix(jmat), sps.csc_matrix((npp, npp))]),
    ]).tocsc()
    lu = spsla.splu(K)

    def solve(rhsv, rhsp=None):
        if rhsp is None:
            rhsp = np.zeros((npp,))
        rhs = np.concatenate([np.asarray(rhsv).ravel(),
                              np.asarray(rhsp).ravel()])
        return lu.solve(rhs).reshape(-1, 1)

    return solve


def solve_sadpnt_host(amat=None, jmat=None, jmatT=None, rhsv=None, rhsp=None,
                      umat=None, vmat=None):
    """One-shot host solve; SMW handled by explicit dense correction."""
    solve = host_saddle_factorized(amat, jmat, jmatT)
    x0 = solve(rhsv, rhsp)
    if umat is None:
        return x0
    nv, npp = amat.shape[0], jmat.shape[0]
    k = umat.shape[1]
    uh = np.vstack([_to_dense(umat), np.zeros((npp, k))])
    W = np.hstack([solve(uh[: nv, i], uh[nv:, i]) for i in range(k)])
    vh = np.hstack([_to_dense(vmat), np.zeros((vmat.shape[0], npp))])
    coef = np.linalg.solve(np.eye(k) - vh @ W, vh @ x0)
    return x0 + W @ coef
