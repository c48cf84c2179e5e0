"""``get_v_conv_conts`` — API parity with the reference's linearized
convection helper (stokes_navier_utils.py:40-133): the Newton/Picard/
semi-explicit convection contributions condensed to the inner dofs.

Internally everything rides the device kernels; this wrapper returns the
reference's ``(convc_mat, rhs_con, rhsv_conbc)`` triple with scipy
matrices for host callers.
"""

import numpy as np
import scipy.sparse as sps

import jax.numpy as jnp


def get_v_conv_conts(vvec=None, prob=None, semi_explicit=False,
                     Picard=False, retparts=False, **kw):
    """``vvec``: inner (condensed) or full velocity vector."""
    vvec = np.asarray(vvec).ravel()
    if len(vvec) == prob.nv_full:
        v_full = jnp.asarray(vvec)
    else:
        v_full = prob.embed(vvec)
    kern = prob.conv_kernel
    inv = prob.invinds

    if semi_explicit:
        rhs_con = np.asarray(kern.vector(v_full))[inv].reshape(-1, 1)
        return 0.0, -rhs_con, 0.0

    from ..ops.condense import condense_velmat
    from ..ops.convection import convection_matrices_host

    N1, N2, rhs_con = convection_matrices_host(prob.ctx,
                                               np.asarray(v_full))
    dbc = dict(invinds=inv, dbcinds=[prob.bcinds], dbcvals=[prob.bcvals])

    if Picard:
        convc_mat, rhsv_conbc = condense_velmat(N1, **dbc)
        return convc_mat, None, rhsv_conbc
    if retparts:
        m1, b1 = condense_velmat(N1, **dbc)
        m2, b2 = condense_velmat(N2, **dbc)
        return (m1, m2), rhs_con[inv], (b1, b2)
    convc_mat, rhsv_conbc = condense_velmat(
        sps.csr_matrix(N1 + N2), **dbc)
    return convc_mat, rhs_con[inv], rhsv_conbc


def expand_vp(prob, vc=None, pc=None, vp=None):
    """Reference ``expand_vp_dolfunc`` semantics without dolfin: inner
    (condensed) vectors -> full-dof velocity (+ pinned-pressure padding).
    Returns ``(v_full (nv_full,1), p_full or None)``."""
    if vp is not None:
        nin = len(prob.invinds)
        vc, pc = vp[:nin], -vp[nin:]     # raw saddle: flip to physical p
    v_full = None
    if vc is not None:
        vc = np.asarray(vc).ravel()
        if len(vc) == prob.nv_full:
            v_full = vc.reshape(-1, 1)
        else:
            v_full = np.asarray(prob.embed(vc)).reshape(-1, 1)
    p_full = None
    if pc is not None:
        pc = np.asarray(pc).ravel()
        if prob.geo.ppin is not None and len(pc) == prob.np_cond:
            pc = np.concatenate([pc, [0.0]])
        p_full = pc.reshape(-1, 1)
    return v_full, p_full


def get_bcinds(prob, tag):
    """Velocity dof indices on a tagged boundary (reference
    ``get_bcinds``, problem_setups.py)."""
    nodes = prob.space.boundary_nodes(tag)
    dim = getattr(prob.space, "dim", 2)
    return np.sort(np.concatenate(
        [dim * nodes + c for c in range(dim)]))
