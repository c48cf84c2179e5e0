"""Pallas kernel correctness (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dolfin_navier_scipy_tpu.ops.pallas_kernels import vecmat_pallas


def test_vecmat_pallas_interpret():
    rng = np.random.default_rng(0)
    m, n = 2048, 1024
    KT = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(m,)).astype(np.float32))
    y = vecmat_pallas(x, KT, interpret=True)
    ref = np.asarray(x) @ np.asarray(KT)
    assert np.allclose(np.asarray(y), ref, atol=2e-2, rtol=1e-4)
