#!/bin/bash
# Example smoke-test driver (reference parity: test_examples.sh:1-11 —
# run every example entry point for a handful of steps).
#
# Usage: ./test_examples.sh [pytest-args...]
# The smoke tests live in tests/test_examples.py (marked slow); this
# driver runs exactly that bucket, serially, with the shared compile
# cache warm across scripts.

set -Ceu
cd "$(dirname "$0")"
exec python -m pytest tests/test_examples.py -m slow -v "$@"
