"""Solvers: saddle-point linear algebra, steady NSE, time integrators."""

from .sadpnt import SaddleSolver, solve_sadpnt, solve_sadpnt_host  # noqa: F401
from .steady import solve_steadystate_nse  # noqa: F401
from .pfromv import get_pfromv  # noqa: F401
