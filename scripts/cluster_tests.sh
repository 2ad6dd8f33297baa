#!/bin/sh
# Multi-process cluster validation (ClusterSpec): real forked executor
# JVMs via local-cluster[2,2,2048], executor kill -9 mid-run, streaming
# restart, PQ store serve. Opt-in — run ALONE (the suite needs the
# JVM's only SparkContext); ~3-6 min, or ~15-40 min with --decade.
#
# Usage: scripts/cluster_tests.sh [artifact.json] [--decade]
#   --decade  also run the 500k-corpus executor-loss row (r15): the
#             GenScaleData corpus is generated once (cached under
#             /tmp/genscale/cluster500k), then the naked-defaults
#             curation facade runs clean + with a mid-run kill -9 and
#             the wall times land in the artifact's metrics block.
# Writes the per-test JSON evidence (outcomes + killed executor PIDs
# + metrics) to the given path — commit it as CLUSTER_r{N}.json so the
# round artifacts prove the multi-process tier ran.
set -e
cd "$(dirname "$0")/.."
ARTIFACT=${1:-target/cluster_result.json}
DECADE=""
for a in "$@"; do [ "$a" = "--decade" ] && DECADE=1; done
if [ -n "$DECADE" ] && [ ! -d /tmp/genscale/cluster500k/documents.parquet ]; then
  sbt -batch "Test/runMain graft.tools.GenScaleData /tmp/genscale/cluster500k 500000"
fi
# NOTE: a ${DECADE:+VAR=1} word does NOT parse as an assignment (the
# shell identifies assignments before expansion) — export instead
[ -n "$DECADE" ] && export GRAFT_CLUSTER_DECADE=1
GRAFT_CLUSTER_TESTS=1 SPARK_HOME=${SPARK_HOME:-/opt/spark} SPARK_SCALA_VERSION=2.13 \
  GRAFT_CLUSTER_ARTIFACT="$ARTIFACT" \
  sbt -batch "testOnly graft.ClusterSpec"
echo "cluster evidence written to $ARTIFACT:"
cat "$ARTIFACT"
