#!/bin/sh
# Steady-state benchmark invocation — workflow twin of the reference's
# tests/start-generic-stst-sim.sh (Re-continuation happens inside the
# driver, as in the reference's steadystate_generic.py:16-50).
MSHLVL=${MSHLVL:-2}
RE=${RE:-40}
python3 steadystate_generic.py --meshlvl "${MSHLVL}" --Re "${RE}"
