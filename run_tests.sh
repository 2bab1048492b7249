#!/bin/bash
# Two-bucket test runner (reference parity: .pfnci/run.sh:43-53 splits
# "not slow and not gpu" vs "slow" vs "gpu" CI jobs).
#
#   ./run_tests.sh          # default bucket: -m "not slow and not tpu"
#                           #   (encoded in pytest.ini addopts; < 5 min)
#   ./run_tests.sh slow     # slow bucket: example subprocesses, multihost
#                           #   multi-process tests, the full agent matrix
#   ./run_tests.sh all      # both, sequentially
set -e
cd "$(dirname "$0")"

case "${1:-default}" in
  default)
    python -m pytest tests/ -q ;;
  slow)
    python -m pytest tests/ -q -m "slow and not tpu" --override-ini 'addopts=-s' ;;
  all)
    python -m pytest tests/ -q
    python -m pytest tests/ -q -m "slow and not tpu" --override-ini 'addopts=-s' ;;
  *)
    echo "usage: $0 [default|slow|all]" >&2; exit 2 ;;
esac
