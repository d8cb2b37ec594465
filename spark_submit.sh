#!/usr/bin/env bash
# Cluster invocation (north_rule: spark-submit --py-files, run at two
# cluster sizes N and 4N executors).  The sandbox has no cluster; this
# script documents the real deployment and is exercised in local mode
# by bench.py / tests.
#
# Usage:
#   ./spark_submit.sh <executors> <input_table_or_dir> <output_dir>
# e.g. the two-cluster-size scaling runs of BASELINE.md:
#   ./spark_submit.sh 64  s3://crawl/pages iceberg_cat.db.extracted
#   ./spark_submit.sh 256 s3://crawl/pages iceberg_cat.db.extracted
set -euo pipefail

EXECUTORS="${1:?executors}"
INPUT="${2:?input pages table/dir}"
OUTPUT="${3:?output dir}"

# package the engine for the executors' python workers
ZIP="$(mktemp -d)/cvocr_spark.zip"
(cd "$(dirname "$0")" && zip -qr "$ZIP" cvocr_spark -x '*__pycache__*')

spark-submit \
  --deploy-mode cluster \
  --num-executors "$EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 16g \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \
  --conf spark.sql.files.maxPartitionBytes=128m \
  --py-files "$ZIP" \
  run_extraction_job.py "$INPUT" "$OUTPUT"
