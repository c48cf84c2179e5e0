"""Ensemble (batched) simulation: the embarrassingly-parallel axis.

vmap the CNAB step over a batch of states (e.g. parameter sweeps over
Re, control gains, initial conditions — SURVEY.md section 2.10 names
this as the natural data-parallel axis the serial reference lacks) and
shard the batch across a device-mesh axis with pjit.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ensemble_cnab_step(prob, dt, mesh: Mesh, batch_axis="batch",
                            inv_dtype=None, refine=None):
    """Returns ``(step, place)``:

    ``step(V, NFC)``: one CNAB step applied to a batch of states
    ``V (B, nin)`` with the previous convection ``NFC (B, nin)``;
    jitted with the batch axis sharded over ``batch_axis`` and the
    operators replicated (passed as pytree args, not baked constants).
    ``place(X)``: shards a batch array onto the mesh.
    """
    from ..solve.timeint import _build_ops

    ops = _build_ops(prob, dt, theta=0.5, inv_dtype=inv_dtype, refine=refine)
    repl = NamedSharding(mesh, P())
    bundle = jax.device_put(
        dict(
            ops=ops,
            kern=prob.conv_kernel,
            invinds=jnp.asarray(prob.invinds),
            v_bc=jnp.asarray(prob.bc_full_vec()),
            fv=jnp.asarray(np.asarray(prob.fv).ravel()),
            fp=jnp.asarray(np.asarray(prob.fp).ravel()),
        ),
        repl,
    )
    nin = ops.nin

    def one_step(b, v, nfc_o):
        v_full = b["v_bc"].at[b["invinds"]].set(v)
        nfc_c = -b["kern"].vector(v_full)[b["invinds"]]
        rhs = (b["ops"].M.matvec(v) - 0.5 * dt * b["ops"].A.matvec(v)
               + 0.5 * dt * (3 * nfc_c - nfc_o) + dt * b["fv"])
        sol = b["ops"].solver.solve(rhs, b["fp"])
        return sol[:nin], nfc_c

    batched = jax.vmap(one_step, in_axes=(None, 0, 0))
    spec = NamedSharding(mesh, P(batch_axis, None))

    jitted = jax.jit(
        batched,
        in_shardings=(repl, spec, spec),
        out_shardings=(spec, spec),
    )

    def step(V, NFC):
        return jitted(bundle, V, NFC)

    def place(X):
        return jax.device_put(jnp.asarray(X), spec)

    return step, place
