#!/usr/bin/env python
"""spark-submit entry point: resumable Stage-A extraction over a pages
table (see spark_submit.sh for the cluster invocation).

    spark-submit --py-files cvocr_spark.zip run_extraction_job.py \
        <input pages dir/table> <output dir> [n_buckets]

Resume semantics: re-running with the same output dir skips every
bucket already committed in the lineage manifest (sources/tableio.py).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from cvocr_spark.session import ensure_shipped
    from cvocr_spark.sources.tableio import run_extraction

    spark = SparkSession.builder.appName("cvocr-extract").getOrCreate()
    ensure_shipped(spark)  # no-op redundancy when --py-files already did it
    pages = spark.read.parquet(inp)
    stats = run_extraction(spark, pages, out, n_buckets=n_buckets)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
