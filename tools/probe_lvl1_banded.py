"""Probe: lvl1 (8k dofs) steps/s — dense-inverse path vs banded
w-space block-Schur path (the new-toolchain cost model says banded
applications are ~30x cheaper than the dense apply at this size)."""
import sys
sys.path.insert(0, ".")
import numpy as np
from bench import (_arm_cache, _ensure_fast_process, build,
                   device_steps_per_sec, baseline_loop)

_arm_cache()
print(f"canary {_ensure_fast_process():.0f} GB/s", flush=True)
prob, dt = build(level=1)
from dolfin_navier_scipy_tpu.solve import solve_nse
v0 = np.asarray(solve_nse(prob=prob, t0=0.0, tE=dt, Nts=1,
                          start_ssstokes=True, save_every=None,
                          linsolver="schur")["iniv"])
_, v64 = baseline_loop(prob, dt, nsteps=300, v0=v0, return_v=True)
for name, kw in [
    ("dense", dict(linsolver="dense")),
    ("schur-banded r0", dict(linsolver="schur", layout="full")),
    ("schur-banded r1", dict(linsolver="schur", layout="full",
                             warm_refine=1)),
]:
    try:
        sp, v, _ = device_steps_per_sec(prob, dt, mode="accurate",
                                        v0=v0, **kw)
        _, v300, _ = device_steps_per_sec(prob, dt, nsteps=300,
                                          mode="accurate", v0=v0, **kw)
        rel = float(np.linalg.norm(v300 - v64) / np.linalg.norm(v64))
        print(f"{name}: {sp:.1f} steps/s rel_err {rel:.2e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {e!r}", flush=True)
