"""Differentiable CNAB (discrete adjoint): jax.grad through the scan
matches central finite differences.  A capability beyond the reference
(its forward loops are scipy/dolfin black boxes — no adjoint path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dolfin_navier_scipy_tpu.models import drivencavity_problem
from dolfin_navier_scipy_tpu.solve import solve_steadystate_nse
from dolfin_navier_scipy_tpu.solve.adjoint import make_diff_cnab


@pytest.fixture(scope="module")
def setup():
    prob = drivencavity_problem(N=8, nu=1e-2)
    vss = solve_steadystate_nse(prob, verbose=False, vel_nwtn_tol=1e-12)
    v0 = np.asarray(vss).ravel()[prob.invinds]
    # actuation direction: a smooth body-force pattern over inner dofs
    rng = np.random.default_rng(7)
    b = np.zeros(prob.nv_full)
    b[prob.invinds] = rng.normal(size=len(prob.invinds))
    b /= np.linalg.norm(b)
    return prob, v0, b


def test_grad_wrt_control_schedule(setup):
    prob, v0, b = setup
    dt, n = 1e-3, 12
    sim = make_diff_cnab(prob, dt, bvec=b)
    Min = jnp.asarray(prob.Mc.todense())

    def cost(amps):
        v = sim(v0, amps)
        return 0.5 * v @ (Min @ v)              # kinetic energy

    amps0 = jnp.zeros(n)
    g = np.asarray(jax.grad(cost)(amps0))
    # central FD on three schedule entries (first, middle, last)
    eps = 1e-4
    for i in (0, n // 2, n - 1):
        e = np.zeros(n)
        e[i] = eps
        fp_ = float(cost(jnp.asarray(amps0 + e)))
        fm_ = float(cost(jnp.asarray(amps0 - e)))
        fd = (fp_ - fm_) / (2 * eps)
        assert abs(g[i] - fd) < 1e-4 * max(1.0, abs(fd)), (i, g[i], fd)
    # later-in-time controls act over fewer steps: the terminal-energy
    # sensitivity must be finite and the adjoint nonzero everywhere
    assert np.all(np.isfinite(g)) and np.all(np.abs(g) > 0)


def test_grad_wrt_initial_state(setup):
    prob, v0, b = setup
    dt, n = 1e-3, 10
    sim = make_diff_cnab(prob, dt)
    rng = np.random.default_rng(3)
    d = rng.normal(size=len(v0))
    d /= np.linalg.norm(d)
    amps = jnp.zeros(n)

    def cost(v):
        vT = sim(v, amps)
        return 0.5 * jnp.sum(vT ** 2)

    g = np.asarray(jax.grad(cost)(jnp.asarray(v0)))
    # eps below ~1e-3 lets the f32-kernel evaluation noise dominate the
    # FD quotient (the grad itself is the exact discrete adjoint of the
    # f32-kernel map; measured relerr 6e-6 at eps=1e-3, 1.8e-3 at 1e-5)
    eps = 1e-3
    fp_ = float(cost(jnp.asarray(v0 + eps * d)))
    fm_ = float(cost(jnp.asarray(v0 - eps * d)))
    fd = (fp_ - fm_) / (2 * eps)
    assert abs(g @ d - fd) < 1e-4 * max(1.0, abs(fd)), (g @ d, fd)


def test_gradient_descent_reduces_cost(setup):
    """Three adjoint-gradient steps on the control schedule reduce the
    terminal kinetic-energy cost — the end-to-end optimize-through-the-
    solver loop the reference cannot express."""
    prob, v0, b = setup
    dt, n = 1e-3, 10
    sim = make_diff_cnab(prob, dt, bvec=b)

    def cost(amps):
        v = sim(v0, amps)
        return 0.5 * jnp.sum(v ** 2)

    vg = jax.jit(jax.value_and_grad(cost))
    amps = jnp.zeros(n)
    c0, g = vg(amps)
    cs = [float(c0)]
    lr = 1e-2 / float(jnp.linalg.norm(g))
    for _ in range(3):
        c, g = vg(amps)
        amps = amps - lr * g
        cs.append(float(c))
    cN = float(cost(amps))
    assert cN < cs[0], (cs, cN)
