"""get_v_conv_conts / expand_vp / apply_massinv parity functions."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import (
    apply_massinv,
    expand_vp,
    get_bcinds,
    get_v_conv_conts,
)


@pytest.fixture(scope="module")
def prob():
    return drivencavity_problem(N=6, nu=1e-2)


def test_conv_conts_consistency(prob):
    rng = np.random.default_rng(4)
    v = rng.normal(size=len(prob.invinds))
    # Newton: (N1+N2) v_in + conbc == conv(v_full) at inner dofs
    cm, rhs_con, conbc = get_v_conv_conts(vvec=v, prob=prob)
    _, mrhs, _ = get_v_conv_conts(vvec=v, prob=prob, semi_explicit=True)
    # (N1+N2) v_full |inner = cm @ v_in - conbc  and equals 2 N(v)v
    lhs = cm @ v - np.asarray(conbc).ravel()
    assert np.allclose(lhs, 2 * (-np.asarray(mrhs).ravel()), atol=1e-10)
    # Picard: N1 v_full |inner = pm @ v_in - pbc = N(v)v
    pm, _, pbc = get_v_conv_conts(vvec=v, prob=prob, Picard=True)
    assert np.allclose(pm @ v - np.asarray(pbc).ravel(),
                       -np.asarray(mrhs).ravel(), atol=1e-10)
    # retparts sums to the Newton matrix
    (m1, m2), rc, (b1, b2) = get_v_conv_conts(vvec=v, prob=prob,
                                              retparts=True)
    assert abs((m1 + m2) - cm).max() < 1e-12


def test_expand_vp(prob):
    rng = np.random.default_rng(5)
    v = rng.normal(size=len(prob.invinds))
    p = rng.normal(size=prob.np_cond)
    vf, pf = expand_vp(prob, vc=v, pc=p)
    assert vf.shape == (prob.nv_full, 1)
    assert pf.shape == (prob.np_cond + 1, 1)    # pinned dof padded
    assert np.allclose(vf.ravel()[prob.invinds], v)
    assert pf[-1, 0] == 0.0


def test_apply_massinv(prob):
    rng = np.random.default_rng(6)
    r = rng.normal(size=prob.Mc.shape[0])
    x = apply_massinv(prob.Mc, r)
    assert np.allclose(prob.Mc @ x.ravel(), r, atol=1e-10)


def test_get_bcinds(prob):
    inds = get_bcinds(prob, 4)     # the lid
    assert len(inds) > 0
    assert np.all(np.isin(inds, prob.bcinds))
