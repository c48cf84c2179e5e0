"""LTI controller discretizations as pure (scan-safe) functions.

Twins of the reference's ``get_heunab_lti`` / ``get_heuntrpz_lti``
(time_int_utils.py:148-257): step a linear observer

    hx' = hA hx + hb y,    u = hc hx   (+ drift)

alongside the flow with matched Heun/AB2 or Heun/implicit-trapezoidal
schemes.  The reference's mutable ``memory`` dicts become explicit
pytree state threaded through the integrators' ``dynamic_rhs`` protocol
(modes: init / heunpred / heuncorr / abtwo).
"""

import numpy as np

import jax.numpy as jnp


def get_heunab_lti(hb=None, ha=None, hc=None, inihx=None, drift=None):
    """Heun/AB2 observer stepping (time_int_utils.py:148-196).

    Returns ``(fn, memory0)`` with
    ``fn(t, vc=None, memory=..., mode=...) -> (hc @ hx, memory)``.
    """
    ha = jnp.asarray(np.asarray(ha))
    hb = jnp.asarray(np.asarray(hb))
    hc = jnp.asarray(np.asarray(hc))
    inihx = jnp.asarray(np.asarray(inihx)).reshape(-1)
    if drift is None:
        zero = jnp.zeros_like(inihx)
        drift = lambda t: zero                     # noqa: E731

    mem0 = dict(lastt=jnp.asarray(0.0), lasthx=inihx,
                lastrhs=jnp.zeros_like(inihx), lastdt=jnp.asarray(0.0),
                hphx=inihx)

    def fn(t, vc=None, memory=None, mode="abtwo"):
        m = dict(memory)
        vc = jnp.asarray(vc).reshape(-1) if vc is not None else None
        if mode == "init":
            m.update(lastt=jnp.asarray(t, dtype=jnp.float64), lasthx=inihx)
            return hc @ inihx, m
        if mode == "heunpred":
            curdt = t - m["lastt"]
            currhs = ha @ inihx + hb @ vc + drift(m["lastt"])
            chx = inihx + curdt * currhs
            m.update(lastrhs=currhs, hphx=chx)
            return hc @ chx, m
        if mode == "heuncorr":
            curdt = t - m["lastt"]
            currhs = ha @ m["hphx"] + hb @ vc + drift(t)
            chx = inihx + 0.5 * curdt * (currhs + m["lastrhs"])
            m.update(lastt=jnp.asarray(t, dtype=jnp.float64), lasthx=chx,
                     lastdt=curdt)
            return hc @ chx, m
        # abtwo
        curdt = t - m["lastt"]
        currhs = ha @ m["lasthx"] + hb @ vc + drift(m["lastt"])
        chx = (m["lasthx"] + 1.5 * curdt * currhs
               - 0.5 * m["lastdt"] * m["lastrhs"])
        m.update(lastt=jnp.asarray(t, dtype=jnp.float64), lasthx=chx,
                 lastrhs=currhs, lastdt=curdt)
        return hc @ chx, m

    return fn, mem0


def get_heuntrpz_lti(hb=None, ha=None, hc=None, inihx=None, drift=None,
                     constdt=None):
    """Heun bootstrap + implicit-trapezoidal observer stepping
    (time_int_utils.py:199-257); requires a uniform time grid."""
    if constdt is None:
        raise NotImplementedError("uniform time grid required (reference "
                                  "raises too, time_int_utils.py:217)")
    ha = jnp.asarray(np.asarray(ha))
    hb = jnp.asarray(np.asarray(hb))
    hc = jnp.asarray(np.asarray(hc))
    inihx = jnp.asarray(np.asarray(inihx)).reshape(-1)
    hN = ha.shape[0]
    cdt = constdt
    obsitmat = jnp.asarray(
        np.linalg.inv(np.eye(hN) - constdt / 2.0 * np.asarray(ha)))
    if drift is None:
        zero = jnp.zeros_like(inihx)
        drift = lambda t: zero                     # noqa: E731

    mem0 = dict(lastt=jnp.asarray(0.0), lasthx=inihx,
                lastrhs=jnp.zeros_like(inihx), hphx=inihx)

    def fn(t, vc=None, memory=None, mode="abtwo"):
        m = dict(memory)
        vc = jnp.asarray(vc).reshape(-1) if vc is not None else None
        if mode == "init":
            m.update(lastt=jnp.asarray(t, dtype=jnp.float64), lasthx=inihx)
            return hc @ inihx, m
        if mode == "heunpred":
            currhs = hb @ vc + drift(t)
            chx = inihx + cdt * (ha @ inihx + currhs)
            m.update(lastrhs=currhs, lasthx=inihx, hphx=chx)
            return hc @ chx, m
        if mode == "heuncorr":
            currhs = hb @ vc + drift(t)
            chx = inihx + 0.5 * cdt * (
                ha @ (m["hphx"] + m["lasthx"]) + currhs + m["lastrhs"])
            m.update(lastt=jnp.asarray(t, dtype=jnp.float64), lasthx=chx,
                     lastrhs=currhs)
            return hc @ chx, m
        # implicit trapezoidal
        crhs = hb @ vc + drift(t)
        chx = obsitmat @ (m["lasthx"] + 0.5 * cdt * (
            ha @ m["lasthx"] + crhs + m["lastrhs"]))
        m.update(lasthx=chx, lastrhs=crhs)
        return hc @ chx, m

    return fn, mem0
