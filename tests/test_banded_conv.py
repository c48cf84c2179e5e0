"""Banded convection tail == index element pipeline (w-space layout).

The banded tail (ops/banded_conv.py) replaces the gather/segment_sum
convection pipeline in the w-space fast path with static-window banded
matmuls; its contract is equality with ``ConvectionKernel.vector`` on
the interior rows, consuming the constant bc tail via the precomputed
``ue_bc`` field.  (The end-to-end trajectory equivalence rides
``test_timeint.py::test_schur_full_layout_matches_inner``, whose split
branch now takes this path.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.ops.banded_conv import build_banded_conv_tail


@pytest.fixture(scope="module")
def wspace():
    """A w-space-mapped f32 kernel + layout, as timeint builds it."""
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    prob = drivencavity_problem(N=12, nu=1e-2)
    dt = 1e-3
    F = sps.csr_matrix(prob.Mc + 0.5 * dt * prob.Ac)
    perm = np.asarray(reverse_cuthill_mckee(F, symmetric_mode=True))
    nin, nv_full = F.shape[0], prob.nv_full
    bcdofs = np.setdiff1d(np.arange(nv_full), np.asarray(prob.invinds))
    wsrc = np.concatenate([np.asarray(prob.invinds)[perm],
                           bcdofs]).astype(np.int64)
    iposx = np.full(nv_full + 1, nv_full, np.int32)
    iposx[wsrc] = np.arange(nv_full, dtype=np.int32)
    kern = prob.conv_kernel_f32.with_dof_map(jnp.asarray(iposx))
    vbc_w = np.asarray(prob.bc_full_vec()).ravel()[wsrc]
    return prob, kern, nin, vbc_w


def test_banded_tail_matches_index_pipeline(wspace):
    prob, kern, nin, vbc_w = wspace
    bct = build_banded_conv_tail(kern, nin, vbc_w[nin:], force=True)
    assert bct is not None
    rng = np.random.default_rng(3)
    # w-space state: random interior + the REAL constant bc tail
    v = vbc_w.copy()
    v[:nin] = rng.standard_normal(nin)
    v_j = jnp.asarray(v)
    ref = np.asarray(kern.vector(v_j))
    out = np.asarray(bct.vector(v_j))
    den = np.abs(ref[:nin]).max()
    assert np.abs(ref[:nin] - out[:nin]).max() / den < 5e-6
    # bc tail rows are zero by construction
    assert np.abs(out[nin:]).max() == 0.0


def test_gate_returns_none_when_too_big(wspace):
    prob, kern, nin, vbc_w = wspace
    assert build_banded_conv_tail(kern, nin, vbc_w[nin:],
                                  max_gb=1e-9) is None


def test_gate_env_disable(wspace, monkeypatch):
    prob, kern, nin, vbc_w = wspace
    monkeypatch.setenv("DNS_TPU_BANDED_CONV", "0")
    assert build_banded_conv_tail(kern, nin, vbc_w[nin:]) is None
