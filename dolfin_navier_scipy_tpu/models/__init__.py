"""Problem setups: geometry descriptors -> device-ready NSE problems.

The analogue of the reference's ``problem_setups.py`` registry
(drivencavity / cylinderwake / gen_bccont / cylinder_rot).
"""

from .problem import NSEProblem, build_problem, GeoSetup  # noqa: F401
from .drivencavity import drivencavity_problem  # noqa: F401
from .cylinderwake import cylinderwake_problem, geosetup_from_json  # noqa: F401
from .cylinderwake3d import cylinderwake3d_problem  # noqa: F401
from .registry import get_sysmats  # noqa: F401
from .functionals import LiftDragSurfForce, pressure_drop  # noqa: F401
