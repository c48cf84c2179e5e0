import numpy as np, bench, time
from bench import build, _arm_cache, device_steps_per_sec
_arm_cache()
prob, dt = build(level=2)
from dolfin_navier_scipy_tpu.solve.timeint import _build_ops
from dolfin_navier_scipy_tpu.solve.sadpnt import solve_sadpnt_host
t0=time.time()
ops = _build_ops(prob, dt, theta=0.5, precision="accurate",
                 linsolver="schur", layout="full")
print("setup", round(time.time()-t0,1), "banded:", ops.solver.Bblk is not None,
      "bs", ops.solver._bs, "nblk", ops.solver._nblk, flush=True)
vp = solve_sadpnt_host(amat=prob.Mc + 0.5*dt*prob.Ac, jmat=prob.Jc,
                       jmatT=prob.JTc, rhsv=np.asarray(prob.fv).ravel(),
                       rhsp=np.asarray(prob.fp).ravel())
v0 = vp[:len(prob.invinds),0]
for wr, it in [(0,6),(0,14),(1,6)]:
    s,_,ops = device_steps_per_sec(prob, dt, nsteps=300, mode="accurate",
        linsolver="schur", layout="full", v0=v0, ops=ops,
        warm_refine=wr, niter_warm=it)
    print(f"refine={wr} niter={it}: {s:.1f} steps/s = {1e3/s:.2f} ms/step",
          flush=True)
