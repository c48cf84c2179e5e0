#!/bin/sh
# Nts-doubling convergence check — workflow twin of the reference's
# tests/start-tdp-convcheck.sh (2nd-order CNAB/SBDF2 self-convergence).
MSHLVL=${MSHLVL:-2}
RE=${RE:-50}
TE=${TE:-.1}
TIS=${TIS:-sbdf2}
python3 tdp_convcheck.py --meshlvl "${MSHLVL}" --Re "${RE}" \
    --tE "${TE}" --scheme "${TIS}"
