"""Probe: does low-bit *storage* of banded blocks cut the HBM stream?

Every banded application is HBM-bound (docs/PERF_NOTES.md section 8),
so bytes-per-apply is the cost.  Two storage candidates:

* **int8** for the 0/1 conv scatter/gather blocks (exact, like bf16 —
  the question is whether XLA fuses the int8->f32 convert into the
  matmul's operand stream, i.e. whether HBM reads int8 or a
  materialized f32 copy);
* **bf16** for the value-carrying W/X blocks (0.4% storage rounding —
  only usable where a refine round absorbs it; here we only measure
  the stream).

Measures the slope (per-application us) of a scan over the same
einsum form as ``sadpnt._rect_mv`` at lvl2-conv-like and lvl2-W-like
block shapes, per storage dtype.

Run ALONE on the TPU host (single core, docs/PERF_NOTES.md section 9).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def slope_us(blocks, x, nit=60):
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(B, x0, n):
        def body(c, _):
            y = jnp.einsum("kij,kj->ki", B, c,
                           precision=jax.lax.Precision.HIGHEST)
            # fold output back to window shape to chain iterations;
            # normalize so the carry never underflows to zero (a zero
            # carry makes all runs' outputs identical and the runtime's
            # result cache serves phantoms — PERF_NOTES section 5)
            c2 = jnp.zeros_like(c).at[:, : y.shape[1]].set(y)
            return c2 / (jnp.linalg.norm(c2) + 1e-9), None

        c, _ = jax.lax.scan(body, x0, None, length=n)
        return c

    # the axon runtime serves cached results (sometimes even across
    # perturbed inputs on the first repeat) — perturb every call,
    # discard the first repeat of each length, take the median slope
    # (docs/PERF_NOTES.md section 5).
    run(blocks, x, 10).block_until_ready()
    run(blocks, x, nit).block_until_ready()
    ts = {}
    for n in (10, nit):
        els = []
        for rep in range(1, 5):
            xp = x * (1.0 + (n + rep) * 1e-6)
            t0 = time.perf_counter()
            # np.asarray (device->host read) inside the timed region:
            # block_until_ready alone has been observed returning
            # before the work is visible; the transfer is constant per
            # call and cancels in the slope.
            np.asarray(run(blocks, xp, n))
            els.append(time.perf_counter() - t0)
        ts[n] = float(np.median(els[1:]))
    return (ts[nit] - ts[10]) / (nit - 10) * 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    cases = [
        # (label, nblk, bs, w, zero_one)
        ("conv-S lvl2", 105, 256, 2816, True),
        ("conv-G lvl2", 565, 256, 768, True),
        ("W lvl2", 210, 128, 5632, False),
    ]
    for label, nblk, bs, w, zo in cases:
        if zo:
            B = (rng.random((nblk, bs, w)) < 12.0 / w).astype(np.float32)
        else:
            B = rng.standard_normal((nblk, bs, w)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((nblk, w)), jnp.float32)
        mb = B.nbytes / 1e6
        rows = []
        for name in ("f32", "bf16", "f16", "int8", "int16"):
            if name == "int8" and not zo:
                continue
            if name == "int16":
                # per-(block,row) symmetric scales; the dequant rides
                # the OUTPUT (``s * (Bq @ x)``), so the HBM question —
                # does the scan stream 2-byte blocks or a hoisted f32
                # copy? — is isolated in Bq.  eps = 1/32767 ~ 3e-5:
                # well under bf16's 3.9e-3, absorbed by one refine
                # round (docs/PERF_NOTES.md section 14's criterion).
                s = np.maximum(np.abs(B).max(axis=2), 1e-30) / 32767.0
                Bd = jnp.asarray(
                    np.round(B / s[:, :, None]).astype(np.int16))
            elif name == "int8":
                Bd = jnp.asarray(B, jnp.int8)
            else:
                Bd = jnp.asarray(B, jnp.float32).astype(
                    dict(f32=jnp.float32, bf16=jnp.bfloat16,
                         f16=jnp.float16)[name])
            us = slope_us(Bd, x)
            eff = Bd.nbytes / us / 1e3  # GB/s vs STORED bytes
            rows.append(f"{name}: {us:8.1f} us  "
                        f"({Bd.nbytes/1e6:6.1f} MB stored, "
                        f"{eff:6.0f} GB/s-of-stored)")
            del Bd
        print(f"{label} ({mb:.0f} MB f32):", flush=True)
        for r in rows:
            print("   ", r, flush=True)


if __name__ == "__main__":
    main()
