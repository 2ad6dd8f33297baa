#!/bin/sh
# Multi-process cluster validation (ClusterSpec): real forked executor
# JVMs via local-cluster[2,2,2048], executor kill -9 mid-run, streaming
# restart, PQ store serve. Opt-in — run ALONE (the suite needs the
# JVM's only SparkContext); ~3-6 min.
set -e
cd "$(dirname "$0")/.."
GRAFT_CLUSTER_TESTS=1 SPARK_HOME=${SPARK_HOME:-/opt/spark} SPARK_SCALA_VERSION=2.13 \
  exec sbt -batch "testOnly graft.ClusterSpec"
