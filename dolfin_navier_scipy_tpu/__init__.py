"""dolfin_navier_scipy_tpu — a TPU-native incompressible Navier-Stokes framework.

A from-scratch re-design of the capabilities of
``highlando/dolfin_navier_scipy`` (reference: /root/reference) for TPU
hardware.  Instead of bridging FEniCS/dolfin C++ assembly with scipy sparse
LU (reference: dolfin_to_sparrays.py, stokes_navier_utils.py), this package

* compiles meshes/FEM spaces host-side into static-sparsity index arrays
  ("geometry compilation"),
* runs assembly of the state-dependent convection operators, saddle-point
  solves and the entire time loop on device (JAX/XLA/Pallas, ``lax.scan``),
* scales out via ``jax.sharding`` meshes (ensemble vmap + dof-sharded
  operators) instead of the reference's serial-only execution.

Default precision is float64 (the reference's benchmarks require it;
cf. Newton tolerances of 5e-15 in stokes_navier_utils.py:223).  Set the
environment variable ``DNS_TPU_X64=0`` to run in float32.
"""

import os as _os

from jax import config as _jax_config

if _os.environ.get("DNS_TPU_X64", "1") != "0":
    _jax_config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 passes; FEM solves need true-f32 products
# (the increment-form integrators budget ~1e-7 per operator application —
# bf16's 2^-8 destroys the Schur/PCG solves and any Newton-Schulz polish).
# All hot paths here are HBM-bound matvecs, so this costs no wall-clock.
# DNS_TPU_MATMUL_F32=0 opts out for processes embedding this library
# alongside bf16-matmul JAX code.
if _os.environ.get("DNS_TPU_MATMUL_F32", "1") != "0":
    _jax_config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"

from . import fem, mesh, ops, solve, models, parallel, utils  # noqa: E402,F401
