"""Scale-out: sharded operators and ensemble (batched) simulation.

The reference is strictly serial (SURVEY.md section 2.10); these are the
TPU-native equivalents: element-sharded operators (replicated state +
one psum), halo-exchange band-partitioned operators (O(bandwidth)
ppermutes), dof-sharded SpMV over an ICI mesh, row-sharded Schur
factors (capacity mode), and vmap/pjit ensembles over parameter sweeps.
"""

from .ensemble import (                                      # noqa: F401
    make_ensemble_cnab_scan,
    make_ensemble_cnab_step,
    make_ensemble_wspace_scan,
)
from .halo import HaloAffineOps                              # noqa: F401
from .spatial import (                                       # noqa: F401
    ShardedAffineOps,
    ShardedConvKernel,
    ShardedSchurSolver,
    make_sharded_cnab_step,
)
