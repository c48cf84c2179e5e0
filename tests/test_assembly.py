"""Operator-assembly correctness: analytic integrals, operator identities,
and the manufactured-field convection identities of the reference's
tests/test_units_fenicsci.py:81-85 (``N(u)u == N1(u) u == N2(u) u``)."""

import numpy as np
import scipy.sparse.linalg as spsla

from dolfin_navier_scipy_tpu.fem.dofmap import TaylorHoodSpace
from dolfin_navier_scipy_tpu.mesh import unit_square
from dolfin_navier_scipy_tpu.ops.assemble import (
    AssemblyContext,
    assemble_rhs,
    assemble_stokes,
)
from dolfin_navier_scipy_tpu.ops.convection import (
    ConvectionKernel,
    convection_matrices_host,
    convection_vector_host,
)


def _setup(n=6):
    mesh = unit_square(n)
    space = TaylorHoodSpace(mesh)
    ctx = AssemblyContext(space)
    return mesh, space, ctx


def _interp_p2(space, fn):
    """Interpolate a velocity field (x -> (2,)) onto the P2 dofs."""
    vals = np.array([fn(x) for x in space.p2_coords])
    return vals.reshape(-1)


def test_mass_matrix_total():
    _, space, ctx = _setup(5)
    mats = assemble_stokes(ctx, nu=1.0, outflow_tag=None)
    ones = np.ones(space.nv_full)
    # int 1*1 dx per component = 1 -> ones' M ones = 2 (two components)
    assert np.isclose(ones @ (mats["M"] @ ones), 2.0)
    onesp = np.ones(space.np_full)
    assert np.isclose(onesp @ (mats["MP"] @ onesp), 1.0)
    # symmetry
    assert abs(mats["M"] - mats["M"].T).max() < 1e-14
    assert abs(mats["A"] - mats["A"].T).max() < 1e-14


def test_stiffness_energy():
    _, space, ctx = _setup(6)
    nu = 0.7
    mats = assemble_stokes(ctx, nu=nu, gradvsymmtrc=True, outflow_tag=None)
    # u = (x, -y): grad u = diag(1,-1), div u = 0
    u = _interp_p2(space, lambda x: (x[0], -x[1]))
    # energy: nu*int (grad u + grad u^T):grad u = nu*int 2*(1+1) = 4 nu
    assert np.isclose(u @ (mats["A"] @ u), 4 * nu)
    # divergence: J u tests (q, div u) = 0
    assert np.allclose(mats["J"] @ u, 0.0, atol=1e-13)
    # pure shear u = (y, 0): J u = 0, energy nu*int(1) = nu (sym: grad+gradT)
    ushear = _interp_p2(space, lambda x: (x[1], 0.0))
    assert np.allclose(mats["J"] @ ushear, 0.0, atol=1e-13)
    assert np.isclose(ushear @ (mats["A"] @ ushear), nu)


def test_divergence_operator_values():
    _, space, ctx = _setup(5)
    mats = assemble_stokes(ctx, nu=1.0, outflow_tag=None)
    # u = (x, 0): div u = 1 -> J u = MP @ 1
    u = _interp_p2(space, lambda x: (x[0], 0.0))
    onesp = np.ones(space.np_full)
    assert np.allclose(mats["J"] @ u, mats["MP"] @ onesp, atol=1e-13)
    # JT is the transpose
    assert abs(mats["JT"] - mats["J"].T).max() < 1e-14


def test_convection_identities():
    """Manufactured solenoidal field: N(u)u == N1(u)@u == N2(u)@u."""
    _, space, ctx = _setup(5)
    # divergence-free quadratic field
    u = _interp_p2(space, lambda x: (x[1] ** 2, x[0] ** 2))
    N1, N2, fv = convection_matrices_host(ctx, u)
    cv = convection_vector_host(ctx, u)
    assert np.allclose(cv, fv)
    assert np.allclose(N1 @ u, cv.ravel(), atol=1e-12)
    assert np.allclose(N2 @ u, cv.ravel(), atol=1e-12)
    # analytic check: conv = (2 x^2 y, 2 x y^2); test against mass-weighted
    # interpolant via L2 projection residual being orthogonal-ish is overkill;
    # instead integrate conv . (1,1): int 2x^2y + 2xy^2 dx = 2/6+2/6 = 2/3
    ones = np.ones(space.nv_full)
    assert np.isclose(ones @ cv.ravel(), 2 / 3, rtol=1e-12)


def test_device_convection_matches_host():
    _, space, ctx = _setup(5)
    rng = np.random.default_rng(1)
    u = rng.normal(size=space.nv_full)
    w = rng.normal(size=space.nv_full)
    kern = ConvectionKernel(ctx)
    # vector: two-field version
    dev = np.asarray(kern.vector(u, w))
    host = convection_vector_host(ctx, u, w).ravel()
    assert np.allclose(dev, host, atol=1e-11)
    # element matrices scattered == host CSR
    N1, N2, _ = convection_matrices_host(ctx, u)
    elems = np.asarray(kern.element_matrices(u, picard_only=False))
    vd = space.vdofs_of_cells()
    import scipy.sparse as sps

    rows = np.broadcast_to(vd[:, :, :, None, None], elems.shape)
    cols = np.broadcast_to(vd[:, None, None, :, :], elems.shape)
    dev_mat = sps.coo_matrix(
        (elems.ravel(), (rows.ravel(), cols.ravel())),
        shape=(space.nv_full, space.nv_full),
    ).tocsr()
    assert abs(dev_mat - (N1 + N2)).max() < 1e-11


def test_rhs_assembly():
    _, space, ctx = _setup(5)
    fv, fp = assemble_rhs(ctx, fv_fn=lambda x: (1.0, 2.0),
                          fp_fn=lambda x: 3.0)
    # int f . phi summed over all phi = int f . (1,1) = 1 + 2
    assert np.isclose(fv.sum(), 3.0)
    assert np.isclose(fp.sum(), 3.0)


def test_outflow_correction_directional():
    """The grad^T-normal facet term vanishes for fields with
    grad(u)^T n = 0 on the outflow and matches an analytic value else."""
    from dolfin_navier_scipy_tpu.ops.assemble import (
        assemble_gradT_normal_facets,
    )

    _, space, ctx = _setup(6)
    corr = assemble_gradT_normal_facets(ctx, tag=2)  # right edge, n=(1,0)
    # u = (x, y) -> grad u = I, grad u^T n = (1,0); v = (1,0):
    # integral over x=1 edge: int 1 ds = 1
    u = _interp_p2(space, lambda x: (x[0], x[1]))
    v = _interp_p2(space, lambda x: (1.0, 0.0))
    assert np.isclose(v @ (corr @ u), 1.0)
    # u = (y, 0): grad u^T = [[0,0],[1,0]], grad u^T n = (0,1) ->
    # pairing with v=(1,0) gives 0, with v=(0,1) gives 1
    u2 = _interp_p2(space, lambda x: (x[1], 0.0))
    assert np.isclose(v @ (corr @ u2), 0.0, atol=1e-13)
    v2 = _interp_p2(space, lambda x: (0.0, 1.0))
    assert np.isclose(v2 @ (corr @ u2), 1.0)
