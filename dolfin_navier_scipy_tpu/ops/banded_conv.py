"""Banded-matmul convection tail for the permuted (w-space) fast path.

Once every solver application is banded (RCM block-tridiagonal F,
static-window J/J^T/X), the nonlinear convection element pipeline —
per-dof gather -> quadrature contraction -> ``segment_sum`` scatter —
dominates the CNAB step: at lvl1 the gather costs 148 us and the
scatter 357 us against ~16 us for a banded matvec, and no index-based
reordering helps (docs/PERF_NOTES.md sections 8/10).  This module
removes the index ops entirely.  With elements sorted along the RCM
state order, the 0/1 scatter matrix ``S (nin, nc*nd)`` and gather
matrix ``G (nc*nd, nin)`` are banded in the same static-window sense
as the solver blocks, so the convection vector becomes

    c(v)[:nin] = S @ quad(G @ v[:nin] + ue_bc)

— static slices plus batched MXU matmuls, zero gathers/scatters
(measured 141 us vs 407 us for the index pipeline at lvl1,
tools/probe_banded_convtail.py).

Two w-space facts keep the windows tight (both relied on by the
callers, see :func:`solve.timeint.cnab`'s split branch):

* convection values at bc tail positions are never consumed — the
  solver slices ``rhs[:nin]`` (sadpnt.SchurSaddleSolver
  .solve_warm_wspace) — so ``S`` drops all bc rows;
* the bc tail of the w-space state is CONSTANT during the scan (the
  step adds a zero-padded inner increment), so the gather splits into
  a banded interior part plus the precomputed constant element field
  ``ue_bc``.

Elements are sorted by the mean RCM position of their INTERIOR dofs:
any two interior dofs of one element couple in F, so they lie within
one F bandwidth of each other and each element's columns fit in a
window of that width.  Including bc-tail positions (>= nin) in the
mean would drag boundary elements toward the tail of the sort and blow
the windows ~7x (measured, same probe).

The banded form trades index latency for HBM bytes: ``S``/``G`` store
``O(n * window)`` f32 each.  :func:`build_banded_conv_tail` estimates
the windows BEFORE allocating and returns ``None`` (caller falls back
to the index pipeline) when the predicted stream cost exceeds the
element pipeline's.

Replaces the per-step convection assembly of the reference
(dolfin_to_sparrays.py:427-472, get_convvec) on the hot path.
"""

import os

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from ..solve.sadpnt import _build_banded_rect, _rect_mv

_LANE = 128

# ---------------------------------------------------------------------------
# Shared banded-vs-index cost model — the ONE definition used by every
# gate (this module, solve/sadpnt.py's banded-F auto gate and
# parallel/halo.py's per-shard tail gate; ADVICE r3: the constants were
# duplicated verbatim and could silently diverge).
#
# * ``STREAM_FLOOR_BPS``: the HBM rate the banded static-window matmuls
#   sustain in a healthy process (measured ~600 GB/s on the v5e slope
#   canary, docs/PERF_NOTES.md section 8).
# * ``INDEX_US_PER_1K_VALS``: in-scan cost of the gather/segment_sum
#   element pipeline per 1k element VALUES (nvals = nc * nd) — the
#   quantity the pipeline actually scales with (per-dof proxies
#   mispredict on element-heavy shards: 3D, higher order; ADVICE r3).
#   Calibrated to reproduce the historical per-dof model (46 us per 1k
#   inner dofs, docs/PERF_NOTES.md section 8/10) at the 2D-P2
#   calibration meshes: lvl1 nin=6994 / nvals=22104 -> nvals/nin = 3.16
#   (lvl2 nin=25966 / nvals=80136 -> 3.09; the calibration uses lvl1's
#   ratio, the few-% spread is far inside the gate's 20% margin)
#   -> 46/3.16 = 14.6 us per 1k vals.
# * ``VALS_PER_DOF_2D``: the measured 2D-P2 nvals/nin ratio, used to
#   translate dof counts when a caller only knows those (sadpnt's
#   SchurSaddleSolver built from bare matrices).  2D-P2-SPECIFIC: 3D /
#   higher-order elements have more values per dof, so the fallback
#   UNDER-predicts index-pipeline cost there — 3D callers must pass
#   ``index_nvals`` (solve/timeint.py does, from the element tables).
# * ``BANDED_WIN_MARGIN``: banded must win by 20% predicted before the
#   gate flips (misprediction near the crossover is cheap either way).
# ---------------------------------------------------------------------------
VALS_PER_DOF_2D = 3.16
STREAM_FLOOR_BPS = float(os.environ.get(
    "DNS_TPU_STREAM_FLOOR_GBPS", "600")) * 1e9
INDEX_US_PER_1K_VALS = float(os.environ.get(
    "DNS_TPU_INDEX_US_PER_1K_VALS", str(46.0 / VALS_PER_DOF_2D)))
BANDED_WIN_MARGIN = float(os.environ.get(
    "DNS_TPU_BANDED_WIN_MARGIN", "0.8"))


def banded_stream_us(nbytes):
    """Predicted per-application cost of streaming ``nbytes`` of banded
    blocks at the healthy-process HBM floor."""
    return nbytes / STREAM_FLOOR_BPS * 1e6


def index_pipeline_us(nvals=None, ndofs=None):
    """Predicted per-application cost of the index (gather/segment_sum)
    element pipeline; prefer ``nvals`` (element values, the true
    scaling variable), fall back to a 2D-P2 dof-based estimate."""
    if nvals is None:
        nvals = ndofs * VALS_PER_DOF_2D
    return INDEX_US_PER_1K_VALS * nvals / 1000.0


def banded_wins(nbytes, nvals=None, ndofs=None):
    """True when the banded stream is predicted to beat the index
    pipeline with margin."""
    return (banded_stream_us(nbytes)
            <= BANDED_WIN_MARGIN * index_pipeline_us(nvals=nvals,
                                                     ndofs=ndofs))


@jax.tree_util.register_pytree_node_class
class BandedConvTail:
    """``vector(v_w) -> (nv_full,)`` convection loads in w-space layout.

    Interior rows carry ``int ((v.grad)v).phi dx`` (matching
    ``ConvectionKernel.vector`` on ``[:nin]`` to f32 round-off); the bc
    tail rows are ZERO (the callers never consume them).  Output dtype
    is the kernel work dtype (f32) — callers cast as needed.

    Pytree-registered: pass through ``jax.jit`` as an argument (the
    S/G blocks are tens-to-hundreds of MB; closing over them would
    embed HLO constants and break remote compiles).
    """

    def __init__(self, kern=None, Sb=None, Gb=None, ue_bc=None,
                 meta=None):
        self.kern, self.Sb, self.Gb, self.ue_bc = kern, Sb, Gb, ue_bc
        if meta is not None:
            (self.Sbases, self.wS, self.Spad, self.Gbases, self.wG,
             self.Gpad, self.nin, self.nvals) = meta

    def tree_flatten(self):
        return ((self.kern, self.Sb, self.Gb, self.ue_bc),
                (self.Sbases, self.wS, self.Spad, self.Gbases, self.wG,
                 self.Gpad, self.nin, self.nvals))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, meta=aux)

    @property
    def nbytes(self):
        return int(self.Sb.nbytes) + int(self.Gb.nbytes)

    def vector(self, v_w):
        k = self.kern
        dt = k.wdet.dtype
        dim, Q = k.dim, k.Q
        ue = _rect_mv(self.Gb, self.Gbases, self.wG, self.nvals,
                      self.Gpad, v_w[: self.nin].astype(dt))
        ue = ue.reshape(k.nc, dim * k.nvpc) + self.ue_bc
        uq = k._bmm(ue, k.W1blk, dim * Q).reshape(k.nc, Q, dim)
        rg = k._bmm(ue, k.W2blk,
                    dim * dim * Q).reshape(k.nc, Q, dim, dim)
        guq = jnp.einsum("edk,eqkc->eqcd", k.JinvT, rg)
        conv = jnp.einsum("eqd,eqcd->eqc", uq, guq)
        wconv = (k.wdet[:, :, None] * conv).reshape(k.nc, dim * Q)
        fe = k._bmm(wconv, k.W3blk, dim * k.nvpc)
        y = _rect_mv(self.Sb, self.Sbases, self.wS, self.nin,
                     self.Spad, fe.reshape(-1))
        return jnp.concatenate(
            [y, jnp.zeros((k.nv_full - self.nin,), y.dtype)])


def _window_bytes(rows, cols, nblk, bs):
    """Predicted banded-block bytes for a (rows, cols) 0/1 pattern
    whose row blocks are ``bs`` wide — computed WITHOUT allocating."""
    lo = np.full(nblk, np.iinfo(np.int64).max)
    hi = np.full(nblk, -1)
    blk = rows // bs
    np.minimum.at(lo, blk, cols)
    np.maximum.at(hi, blk, cols)
    spans = np.where(hi >= 0, hi - lo + 1, 1)
    w = int(np.ceil(spans.max() / _LANE)) * _LANE
    return nblk * bs * max(w, _LANE) * 4


def build_banded_conv_tail(kern, nin, bc_tail, bs=256, max_gb=None,
                           force=False):
    """Build the banded convection tail for a w-space-mapped kernel.

    Parameters: ``kern`` — the f32 :class:`ConvectionKernel` already
    re-indexed with ``with_dof_map`` (w-space ids: ``[0, nin)`` RCM
    interior, ``[nin, nv_full)`` bc tail, ``nv_full`` padding);
    ``nin`` — interior row count; ``bc_tail (nv_full - nin,)`` — the
    constant bc values of the w-space state.

    Returns ``None`` when gated off (blocked f64 kernel, window blow-up
    past the cost model, or ``DNS_TPU_BANDED_CONV=0``) — the caller then
    keeps the index pipeline.
    """
    if os.environ.get("DNS_TPU_BANDED_CONV", "1") == "0":
        return None
    if kern.blk != 1:
        # blocked (f64) kernels pad nc and kron the W tables; the
        # banded tail targets the f32 fast path only
        return None
    vd = np.asarray(kern.vd)
    nv_full, (nc, nd) = kern.nv_full, vd.shape
    msk = vd < nin
    mpos = np.where(msk, vd, 0).sum(1) / np.maximum(msk.sum(1), 1)
    mpos[~msk.any(1)] = nin          # bc-only / padding rows to the end
    eorder = np.argsort(mpos, kind="stable")
    vd_s = vd[eorder]
    nvals = nc * nd
    rows = vd_s.reshape(-1)
    cols = np.arange(nvals)
    keep = rows < nin

    # ---- gate on predicted HBM stream cost, before any allocation ----
    # 0/1 blocks are EXACT in any integer/low-float dtype — int8
    # quarters the HBM stream for free and is an MXU-native operand:
    # measured per application at the lvl2 S/G shapes int8 92.8/288.4
    # us vs bf16 196.0/516.8 vs f32 377.1/607.7 (tools/probe_lowbit.py
    # 2026-08-21).  TPU default int8; CPU keeps f32 (low-bit there is
    # emulated and slower).  DNS_TPU_BANDED_CONV_STORE in
    # {int8, bf16, f32} overrides; the legacy DNS_TPU_BANDED_CONV_BF16
    # =0 knob still forces f32.
    store = os.environ.get("DNS_TPU_BANDED_CONV_STORE")
    if store is None:     # defaults per backend; explicit env wins
        store = ("f32" if jax.default_backend() == "cpu" else "int8")
    if os.environ.get("DNS_TPU_BANDED_CONV_BF16", "1") == "0":
        store = "f32"
    bfac = {"int8": 0.25, "bf16": 0.5}.get(store, 1.0)
    nblk_s = max(1, (nin + bs - 1) // bs)
    nblk_g = max(1, (nvals + bs - 1) // bs)
    by = bfac * (_window_bytes(rows[keep], cols[keep], nblk_s, bs)
                 + _window_bytes(cols[keep], rows[keep], nblk_g, bs))
    if max_gb is None:
        max_gb = float(os.environ.get("DNS_TPU_BANDED_CONV_MAXGB", "1.0"))
    # shared cost model (module head): banded ~ bytes at the HBM floor
    # vs the index pipeline's per-element-value cost.  Require a
    # predicted win.
    if not force and (by > max_gb * 1e9 or not banded_wins(by, nvals=nvals)):
        return None

    ones = np.ones(int(keep.sum()), np.float32)
    S = sps.coo_matrix((ones, (rows[keep], cols[keep])),
                       shape=(nin, nvals)).tocsr()
    Sb, Sbases, wS, Spad = _build_banded_rect(
        S, np.arange(nin), np.arange(nvals), bs)
    G = sps.coo_matrix((ones, (cols[keep], rows[keep])),
                       shape=(nvals, nin)).tocsr()
    Gb, Gbases, wG, Gpad = _build_banded_rect(
        G, np.arange(nvals), np.arange(nin), bs)

    # constant element field from the frozen bc tail
    vpad = np.zeros(nv_full + 1)
    vpad[nin:nv_full] = np.asarray(bc_tail).ravel()
    ue_bc = vpad[np.minimum(vd_s, nv_full)].astype(np.float32)

    kern_s = kern.with_element_order(eorder)
    bdt = {"int8": jnp.int8, "bf16": jnp.bfloat16}.get(store,
                                                       jnp.float32)
    return BandedConvTail(
        kern_s, jnp.asarray(Sb, bdt), jnp.asarray(Gb, bdt),
        jnp.asarray(ue_bc),
        meta=(Sbases, int(wS), int(Spad), Gbases, int(wG), int(Gpad),
              int(nin), int(nvals)))
