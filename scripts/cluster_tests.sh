#!/bin/sh
# Multi-process cluster validation (ClusterSpec): real forked executor
# JVMs via local-cluster[2,2,2048], executor kill -9 mid-run, streaming
# restart, PQ store serve. Opt-in — run ALONE (the suite needs the
# JVM's only SparkContext); ~3-6 min.
#
# Usage: scripts/cluster_tests.sh [artifact.json]
# Writes the per-test JSON evidence (outcomes + killed executor PIDs)
# to the given path — commit it as CLUSTER_r{N}.json so the round
# artifacts prove the multi-process tier ran.
set -e
cd "$(dirname "$0")/.."
ARTIFACT=${1:-target/cluster_result.json}
GRAFT_CLUSTER_TESTS=1 SPARK_HOME=${SPARK_HOME:-/opt/spark} SPARK_SCALA_VERSION=2.13 \
  GRAFT_CLUSTER_ARTIFACT="$ARTIFACT" \
  sbt -batch "testOnly graft.ClusterSpec"
echo "cluster evidence written to $ARTIFACT:"
cat "$ARTIFACT"
