#!/bin/bash
# The round test routine (VERDICT r4 #8: every tier runnable in one window).
#
#   bash scripts/run_tests.sh           # fast tier (~2-3 min warm)
#   bash scripts/run_tests.sh slow      # + bounded slow tier (~8 min warm)
#   bash scripts/run_tests.sh all       # + slowest (full flagship + DP-mesh
#                                       #   integrations; first cold run pays
#                                       #   XLA compiles, repeats hit the
#                                       #   persistent cache in
#                                       #   ~/.cache/gennet_tpu_xla_cpu)
#
# All tiers run on the virtual 8-device CPU mesh (tests/conftest.py); no
# TPU is touched, safe to run next to a chip workload.
set -eu
cd "$(dirname "$0")/.."
case "${1:-fast}" in
  fast) python -m pytest tests/ -q -m "not slow" ;;
  slow) python -m pytest tests/ -q -m "not slowest" ;;
  all)  python -m pytest tests/ -q ;;
  *) echo "usage: $0 [fast|slow|all]" >&2; exit 2 ;;
esac
