"""Element-level device operators must reproduce the condensed scipy
matrices exactly (incl. outflow correction and Robin folds)."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.control import apply_robin_penalty
from dolfin_navier_scipy_tpu.models import cylinderwake_problem


@pytest.fixture(scope="module")
def prob():
    return cylinderwake_problem(level=0, Re=40, charvel=0.2)


def test_element_ops_match_condensed(prob):
    Mop, Aop, Jop = prob.element_ops()
    rng = np.random.default_rng(2)
    x = rng.normal(size=len(prob.invinds))
    q = rng.normal(size=prob.np_cond)
    assert np.allclose(np.asarray(Mop.matvec(x)), prob.Mc @ x, atol=1e-13)
    assert np.allclose(np.asarray(Aop.matvec(x)), prob.Ac @ x, atol=1e-12)
    assert np.allclose(np.asarray(Jop.matvec(x)), prob.Jc @ x, atol=1e-13)
    assert np.allclose(np.asarray(Jop.rmatvec(q)), prob.JTc @ q, atol=1e-13)


def test_element_ops_with_robin():
    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2,
                                bccontrol=True)
    apply_robin_penalty(prob, palpha=1e-3)
    Mop, Aop, Jop = prob.element_ops()
    rng = np.random.default_rng(3)
    x = rng.normal(size=len(prob.invinds))
    assert np.allclose(np.asarray(Aop.matvec(x)), prob.Ac @ x,
                       rtol=1e-11, atol=1e-9)


def test_axpy_matches(prob):
    Mop, Aop, _ = prob.element_ops()
    K = Mop.axpy(0.37, Aop)
    rng = np.random.default_rng(4)
    x = rng.normal(size=len(prob.invinds))
    ref = prob.Mc @ x + 0.37 * (prob.Ac @ x)
    assert np.allclose(np.asarray(K.matvec(x)), ref, atol=1e-12)


def test_conv_kernel_fast_formulation(prob):
    """The big-matmul convection kernel matches the numpy oracle."""
    from dolfin_navier_scipy_tpu.ops.convection import (
        convection_matrices_host,
        convection_vector_host,
    )

    rng = np.random.default_rng(5)
    u = rng.normal(size=prob.nv_full)
    w = rng.normal(size=prob.nv_full)
    kern = prob.conv_kernel
    assert np.allclose(np.asarray(kern.vector(u, w)),
                       convection_vector_host(prob.ctx, u, w).ravel(),
                       atol=1e-11)
    N1, N2, _ = convection_matrices_host(prob.ctx, u)
    elems = np.asarray(kern.element_matrices(u))
    vd = prob.space.vdofs_of_cells()
    import scipy.sparse as sps

    rows = np.broadcast_to(vd[:, :, :, None, None], elems.shape)
    cols = np.broadcast_to(vd[:, None, None, :, :], elems.shape)
    dev = sps.coo_matrix(
        (elems.ravel(), (rows.ravel(), cols.ravel())),
        shape=(prob.nv_full, prob.nv_full)).tocsr()
    assert abs(dev - (N1 + N2)).max() < 1e-11


def test_affine_ops_match_condensed(prob):
    """Affine-factorized fused matvecs == condensed scipy matrices."""
    aff = prob.affine_ops()
    rng = np.random.default_rng(6)
    x = rng.normal(size=len(prob.invinds))
    q = rng.normal(size=prob.np_cond)
    assert np.allclose(np.asarray(aff.m_matvec(x)), prob.Mc @ x, atol=1e-12)
    assert np.allclose(np.asarray(aff.a_matvec(x)), prob.Ac @ x, atol=1e-11)
    assert np.allclose(np.asarray(aff.j_matvec(x)), prob.Jc @ x, atol=1e-12)
    assert np.allclose(np.asarray(aff.jt_matvec(q)), prob.JTc @ q,
                       atol=1e-12)
    fused = np.asarray(aff.ma_matvec(x, 0.7, -0.3))
    assert np.allclose(fused, 0.7 * (prob.Mc @ x) - 0.3 * (prob.Ac @ x),
                       atol=1e-11)


def test_affine_ops_with_robin():
    from dolfin_navier_scipy_tpu.control import apply_robin_penalty

    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2,
                                bccontrol=True)
    apply_robin_penalty(prob, palpha=1e-3)
    aff = prob.affine_ops()
    rng = np.random.default_rng(7)
    x = rng.normal(size=len(prob.invinds))
    assert np.allclose(np.asarray(aff.a_matvec(x)), prob.Ac @ x,
                       rtol=1e-10, atol=1e-8)


def test_fused_vector_and_amatvec():
    """The fused convection+stiffness pipeline (one gather, one stacked
    scatter) equals the separate device ops and the host oracles,
    including the outflow facet corrections of A."""
    import numpy as np

    import jax.numpy as jnp

    from dolfin_navier_scipy_tpu.models import cylinderwake_problem
    from dolfin_navier_scipy_tpu.ops.affine import AffineVectorOps
    from dolfin_navier_scipy_tpu.ops.convection import (
        ConvectionKernel, convection_vector_host)

    prob = cylinderwake_problem(level=0, Re=40, charvel=0.2)
    kern = ConvectionKernel(prob.ctx)
    aff = AffineVectorOps.build(prob, jnp.float64, full_dofs=True)
    rng = np.random.default_rng(3)
    vf = jnp.asarray(rng.standard_normal(prob.nv_full))
    cv, av = kern.vector_and_amatvec(
        vf, prob.nu, sym=True,
        fac_elem=aff.fac_elem, fac_vdofs=aff.fac_vdofs)
    assert np.allclose(np.asarray(cv),
                       convection_vector_host(prob.ctx, np.asarray(vf))
                       .ravel(), atol=1e-12)
    assert np.allclose(np.asarray(av), np.asarray(aff.a_matvec(vf)),
                       atol=1e-12)
    # and against the assembled sparse full A (bc columns included)
    av_sp = prob.full["A"] @ np.asarray(vf)
    assert np.allclose(np.asarray(av), av_sp, atol=1e-10)
