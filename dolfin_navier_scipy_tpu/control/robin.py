"""Robin-penalization boundary control.

The reference's driver pattern (tests/time_dep_nse_bcrob.py:26-31,
tests/steadystate_nse_brob.py:26-27):

    A <- A + 1/palpha * Arob,     B = 1/palpha * Brob

with ``Arob``/``Brob`` the boundary mass/input operators assembled over
the control boundaries (dolfin_to_sparrays.py:277-320).  The control
``u(t)`` then enters through the time-dependent rhs ``fvtd``.
"""

import scipy.sparse as sps


def apply_robin_penalty(prob, palpha):
    """In-place: fold the Robin penalization into the problem's stiffness.

    Returns ``Brob_scaled = 1/palpha * Brob`` (inner dofs x n_controls).
    Invalidates cached device kernels (they depend on ``Ac``).
    """
    if prob.Arob is None:
        raise ValueError("problem was not built with bccontrol=True")
    prob.Ac = sps.csr_matrix(prob.Ac + 1.0 / palpha * prob.Arob)
    prob._steady_kernel = None
    # keep the element tensors consistent (they feed the fast device ops)
    if prob.elem_tensors is not None:
        import numpy as np

        from ..ops.assemble import robin_facet_elements

        Ael = prob.elem_tensors["A"]
        for tag in prob.geo.control_tags:
            cells, elem = robin_facet_elements(prob.ctx, tag)
            np.add.at(Ael, cells,
                      1.0 / palpha * elem.reshape(len(cells), 12, 12))
        prob._element_ops = None
        prob._affine_ops = {}
    return 1.0 / palpha * prob.Brob
