#!/usr/bin/env bash
# Reproduces BASELINE.md §G and §G2: generates the seeded 10x corpora
# under /tmp/genscale and times the heavy query surfaces at both sizes.
# Each harness prints one JSON {query: sec} line; exponents are
# log10(t_big / t_small). Runtime: ~10 min total on 32 cores.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "Test/runMain graft.tools.GenScaleData /tmp/genscale/small 5000"
sbt -batch "Test/runMain graft.tools.GenScaleData /tmp/genscale/big 50000"
sbt -batch "Test/runMain graft.tools.GenScaleEvents /tmp/genscale/ev_small 100000"
sbt -batch "Test/runMain graft.tools.GenScaleEvents /tmp/genscale/ev_big 1000000"

echo "== documents/embeddings, 5k docs =="
sbt -batch "Test/runMain graft.tools.ScaleBench /tmp/genscale/small"   2>/dev/null | grep -o '{.*}'
echo "== documents/embeddings, 50k docs =="
sbt -batch "Test/runMain graft.tools.ScaleBench /tmp/genscale/big"     2>/dev/null | grep -o '{.*}'
echo "== rollup/metrics, 100k events =="
sbt -batch "Test/runMain graft.tools.ScaleBenchEvents /tmp/genscale/ev_small" 2>/dev/null | grep -o '{.*}'
echo "== rollup/metrics, 1M events =="
sbt -batch "Test/runMain graft.tools.ScaleBenchEvents /tmp/genscale/ev_big"   2>/dev/null | grep -o '{.*}'
