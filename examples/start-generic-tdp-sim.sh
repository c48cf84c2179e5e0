#!/bin/sh
# Parameterized time-dependent benchmark invocation — workflow twin of
# the reference's tests/start-generic-tdp-sim.sh (same knobs; its
# empirical stability record "4200 was OK with CNAB, 4000 not" is
# reproduced by examples/tdp_stability_sweep.py).
MSHPRFX=${MSHPRFX:-/root/reference/tests/mesh/karman2D-outlets}
MSHLVL=${MSHLVL:-1}
RE=${RE:-40}
NTS=${NTS:-4200}
TE=${TE:-4}
SCLTST=${SCLTST:-1.}
PRVFRM=${PRVFRM:-200}

python3 time_dep_nse_generic.py \
    --meshprefix "${MSHPRFX}" --meshlevel "${MSHLVL}" \
    --Re "${RE}" --Nts "${NTS}" --tE "${TE}" --scaletest "${SCLTST}" \
    --paraviewframes "${PRVFRM}"
