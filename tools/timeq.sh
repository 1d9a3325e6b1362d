#!/bin/bash
# Time a subset of SparkEntry queries at a given SF dir.
# Usage: tools/timeq.sh sf0.1 q1_agg d9_dup_clusters ...
SF=$1; shift
SPARK_GRAFT_SF_DIR=/root/testdata/$SF SPARK_GRAFT_ONLY=$(IFS=,; echo "$*" | tr ' ' ',') \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
