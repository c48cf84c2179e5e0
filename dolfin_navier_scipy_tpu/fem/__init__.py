"""Reference elements, quadrature and dof maps (the host-side FEM compiler).

Replaces the role of dolfin's C++ form compiler in the reference
(dolfin_to_sparrays.py relies on ``dolfin.assemble`` / FunctionSpaces).
"""

from .reference import (  # noqa: F401
    tri_quadrature,
    edge_quadrature,
    shape_p1,
    dshape_p1,
    shape_p2,
    dshape_p2,
)
from .dofmap import TaylorHoodSpace, interpolate_velocity  # noqa: F401
