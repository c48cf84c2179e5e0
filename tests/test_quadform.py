"""Quadratic convection tensor: ``H (v (x) v) == N(v) v`` and the
linearization identity — twin of the reference's
tests/test_units_fenicsci.py:133-188 (quadratic tensor checks)."""

import numpy as np
import pytest

from dolfin_navier_scipy_tpu.fem.dofmap import TaylorHoodSpace
from dolfin_navier_scipy_tpu.mesh import unit_square
from dolfin_navier_scipy_tpu.ops.assemble import AssemblyContext
from dolfin_navier_scipy_tpu.ops.convection import (
    convection_matrices_host,
    convection_vector_host,
)
from dolfin_navier_scipy_tpu.ops.quadform import (
    QuadConvOp,
    ass_convmat_asmatquad,
)


@pytest.fixture(scope="module")
def setup():
    mesh = unit_square(4)
    space = TaylorHoodSpace(mesh)
    ctx = AssemblyContext(space)
    rng = np.random.default_rng(8)
    v = rng.normal(size=space.nv_full)
    u = rng.normal(size=space.nv_full)
    return space, ctx, v, u


def test_quadop_matches_convection(setup):
    space, ctx, v, u = setup
    qop = QuadConvOp.from_ctx(ctx)
    # H(u (x) w): (u.grad)w tested == convection_vector(w, u)
    hv = np.asarray(qop.vector(v, u))
    ref = convection_vector_host(ctx, v, u).ravel()
    assert np.allclose(hv, ref, atol=1e-12)
    # same-field case
    assert np.allclose(np.asarray(qop.vector(v)),
                       convection_vector_host(ctx, v).ravel(), atol=1e-12)


def test_quadop_linearization(setup):
    space, ctx, v, u = setup
    qop = QuadConvOp.from_ctx(ctx)
    elems = np.asarray(qop.linearized(v))
    N1, N2, _ = convection_matrices_host(ctx, v)
    import scipy.sparse as sps

    vd = space.vdofs_of_cells()
    rows = np.broadcast_to(vd[:, :, :, None, None], elems.shape)
    cols = np.broadcast_to(vd[:, None, None, :, :], elems.shape)
    dev = sps.coo_matrix(
        (elems.ravel(), (rows.ravel(), cols.ravel())),
        shape=(space.nv_full, space.nv_full)).tocsr()
    assert abs(dev - (N1 + N2)).max() < 1e-12


def test_exported_H_kron_identity(setup):
    """``H @ kron(v, v) == N(v) v`` — the reference's export contract
    (dolfin_to_sparrays.py:86-164)."""
    space, ctx, v, u = setup
    H = ass_convmat_asmatquad(ctx)
    hv = H @ np.kron(v, v)
    ref = convection_vector_host(ctx, v).ravel()
    assert np.allclose(hv, ref, atol=1e-12)
    # bilinear version: H @ kron(w, u) = (u.grad)w
    hv2 = H @ np.kron(v, u)
    ref2 = convection_vector_host(ctx, v, u).ravel()
    assert np.allclose(hv2, ref2, atol=1e-12)
