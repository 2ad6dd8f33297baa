#!/bin/sh
# Python-native access smoke (VERDICT r13 #4): package the library and
# drive graft_curate / graft_curation_funnel / graft_dedup_exact /
# graft_quality / graft_cosine_topk / graft_ivf_topk /
# graft_pq_serve_topk from a real PySpark process via spark.sql, with
# brute == ivf == pq_serve equality asserted in Python.
set -e
cd "$(dirname "$0")/.."
sbt -batch package
exec ${SPARK_HOME:-/opt/spark}/bin/spark-submit \
  --master 'local[8]' \
  --jars target/scala-2.13/khronusspark_2.13-0.1.0.jar \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --conf spark.ui.enabled=false \
  scripts/pyspark_smoke.py "${1:-/root/testdata/sf0.001}"
