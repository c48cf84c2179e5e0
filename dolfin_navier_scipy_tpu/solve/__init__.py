"""Solvers: saddle-point linear algebra, steady NSE, time integrators."""

from .sadpnt import (  # noqa: F401
    InverseSaddleSolver,
    SaddleSolver,
    SchurSaddleSolver,
    SMWSolver,
    solve_sadpnt,
    solve_sadpnt_host,
)
from .steady import (solve_steadystate_nse,  # noqa: F401
                     solve_steadystate_pseudotime)  # noqa: F401
from .pfromv import get_pfromv  # noqa: F401
from .timeint import (  # noqa: F401
    DirichletControl,
    cnab,
    sbdf2,
    semi_implicit_euler,
)
from .nse import solve_nse  # noqa: F401
from .adjoint import make_diff_cnab  # noqa: F401
from .newton_ti import solve_nse_newton_ti  # noqa: F401
from .sadpnt import apply_massinv  # noqa: F401
from .convconts import expand_vp, get_bcinds, get_v_conv_conts  # noqa: F401
from .krylov import KrylovCounter, solve_sadpnt_krylov  # noqa: F401
