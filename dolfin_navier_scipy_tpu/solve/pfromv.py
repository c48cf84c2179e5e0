"""Pressure recovery from a velocity field.

Twin of the reference's ``get_pfromv`` (stokes_navier_utils.py:1602-1634):
solve ``[[M, J^T],[J,0]][w;q] = [fv - A v - N(v)v; 0]`` and return the
physical pressure ``p = -q``.  Only valid for a constant rhs in the
continuity equation (same caveat as the reference).
"""

import numpy as np

import jax.numpy as jnp

from .sadpnt import solve_sadpnt_host


def get_pfromv(v=None, prob=None, stokes_flow=False, **kw):
    """``v`` is the *inner* (condensed) velocity; returns ``p (np_cond, 1)``.

    A one-off setup solve -> host SuperLU (size-independent; the device
    LU primitive runs out of VMEM beyond ~25k rows).
    """
    v = np.asarray(v).ravel()
    if stokes_flow:
        rhs_con = 0.0
    else:
        v_full = prob.embed(jnp.asarray(v))
        rhs_con = np.asarray(prob.conv_kernel.vector(v_full))[prob.invinds]
    rhsv = prob.fv.ravel() - prob.Ac @ v - rhs_con
    vp = solve_sadpnt_host(amat=prob.Mc, jmat=prob.Jc, jmatT=prob.JTc,
                           rhsv=rhsv)
    return -vp[prob.Jc.shape[1]:, :]
