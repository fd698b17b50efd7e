#!/usr/bin/env bash
# Full test suite on CPU (interpret-mode Pallas, virtual 8-device mesh),
# split into two pytest processes: XLA's CPU backend segfaults
# (compiler/cache codepaths) after ~150 compilations in one process on
# this image — a jaxlib bug, not a repo one (every file passes standalone
# and the on-chip suite runs all tests in one process).  Two halves keep
# each process under the threshold.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
H1=$(ls tests/test_[a-l]*.py)
H2=$(ls tests/test_[m-z]*.py)
python -m pytest $H1 -q "$@"
python -m pytest $H2 -q "$@"
