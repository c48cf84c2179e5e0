"""Mesh-continuation velocity interpolation (fem.interpolate_velocity).

P2 interpolation reproduces any globally-quadratic field EXACTLY on the
target nodes (node evaluation of an exactly-representable field), so
cross-mesh transfer of such a field is an exactness test independent of
whether the meshes nest.  The reference has no mesh-continuation device
(only Re/nu parameter continuation, tests/steadystate_generic.py:16-50,
tests/steadystate_rotcyl.py:90-102).
"""

import numpy as np

from dolfin_navier_scipy_tpu.fem import interpolate_velocity
from dolfin_navier_scipy_tpu.models import (
    cylinderwake_problem,
    drivencavity_problem,
)


def _quad_field(pts):
    x, y = pts[:, 0], pts[:, 1]
    return np.stack([1.0 + 2 * x - y + x * y + 0.5 * x ** 2,
                     -3.0 + x + 0.25 * y ** 2 - x * y], axis=1)


def test_quadratic_exact_across_cavity_meshes():
    pa = drivencavity_problem(N=5, nu=1e-2)
    pb = drivencavity_problem(N=9, nu=1e-2)
    va = _quad_field(pa.space.p2_coords).ravel()
    vb = interpolate_velocity(va, pa.space, pb.space)
    assert np.allclose(vb, _quad_field(pb.space.p2_coords).ravel(),
                       atol=1e-12)


def test_cylinder_level_continuation_robust():
    """lvl0 -> lvl1 cylinder wake: target nodes on the finer curved-
    boundary approximation fall outside the coarse mesh; the clipped
    nearest-cell fallback must keep the transfer finite and accurate
    away from the boundary."""
    pa = cylinderwake_problem(level=0, nu=1e-3, charvel=0.2)
    pb = cylinderwake_problem(level=1, nu=1e-3, charvel=0.2)
    va = _quad_field(pa.space.p2_coords).ravel()
    vb = interpolate_velocity(va, pa.space, pb.space)
    assert np.isfinite(vb).all()
    ex = _quad_field(pb.space.p2_coords).ravel()
    # interior nodes (away from the cylinder) are exact
    pts = pb.space.p2_coords
    r = np.hypot(pts[:, 0] - 0.2, pts[:, 1] - 0.2)
    interior = np.repeat(r > 0.1, 2)
    err = np.abs(vb - ex)
    assert err[interior].max() < 1e-10, err[interior].max()
    # near-cylinder clipped values stay O(mesh-resolution) close
    assert err.max() < 5e-2, err.max()


def test_quadratic_exact_3d():
    from dolfin_navier_scipy_tpu.fem.dofmap import TaylorHoodSpace3D
    from dolfin_navier_scipy_tpu.mesh.tetmesh import extrude_trimesh
    from dolfin_navier_scipy_tpu.mesh.generators import unit_square

    sa = TaylorHoodSpace3D(mesh=extrude_trimesh(unit_square(3), nz=3,
                                                height=1.0))
    sb = TaylorHoodSpace3D(mesh=extrude_trimesh(unit_square(4), nz=5,
                                                height=1.0))

    def f3(pts):
        x, y, z = pts.T
        return np.stack([x * y + z ** 2, 1.0 + y * z - x ** 2,
                         x * z + 0.5 * y ** 2], axis=1)

    va = f3(sa.p2_coords).ravel()
    vb = interpolate_velocity(va, sa, sb)
    assert np.allclose(vb, f3(sb.p2_coords).ravel(), atol=1e-12)
