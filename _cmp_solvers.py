import time, numpy as np
import bench
bench._arm_cache()
from dolfin_navier_scipy_tpu.solve.timeint import _build_ops
prob, dt = bench.build()
_, v64 = bench.baseline_loop(prob, dt, nsteps=300, return_v=True)
for ls in ('schur', 'dense'):
    t0 = time.time()
    ops = _build_ops(prob, dt, theta=0.5, precision='accurate', linsolver=ls)
    ts = time.time() - t0
    t0 = time.time()
    sps_, v, _ = bench.device_steps_per_sec(prob, dt, nsteps=1000,
                                            mode='accurate', ops=ops)
    tr = time.time() - t0
    extra = ' ncg=%d' % ops.solver.ncg if ls == 'schur' else ''
    print('%s: setup %.1fs first-run %.1fs  %.0f steps/s%s'
          % (ls, ts, tr, sps_, extra), flush=True)
    _, vd, _ = bench.device_steps_per_sec(prob, dt, nsteps=300,
                                          mode='accurate', ops=ops)
    print('  rel err vs f64 @300: %.2e'
          % (np.linalg.norm(vd - v64) / np.linalg.norm(v64)), flush=True)
