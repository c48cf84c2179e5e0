import time
import numpy as np
import bench
bench._arm_cache()
from dolfin_navier_scipy_tpu.mesh.dolfinxml import (
    read_dolfin_xml, read_facet_region)
from dolfin_navier_scipy_tpu.models import cylinderwake_problem

R = "/root/reference/tests/mesh"
m = read_dolfin_xml(f"{R}/karman2D-rotcyl_lvl4.xml.gz")
read_facet_region(m, f"{R}/karman2D-rotcyl_lvl4_facet_region.xml.gz")
prob = cylinderwake_problem(
    mesh=m, geodata=f"{R}/karman2D-rotcyl-bm_geo_cntrlbc.json",
    Re=100, charvel=1.0)
dt = 2.5e-4
t0 = time.time()
sps_, v, _ = bench.device_steps_per_sec(prob, dt, nsteps=200,
                                        mode="accurate",
                                        linsolver="schur", layout="full")
print("lvl4 full-schur (%d dofs): %.1f steps/s (setup+run %.0fs)"
      % (len(prob.invinds) + prob.np_cond, sps_, time.time() - t0),
      flush=True)
