#!/usr/bin/env python
"""spark-submit entry point: the composed curation pipeline
(plans/curate.py) over a documents table — hygiene -> quality gates ->
dedup -> optional eval-set decontamination -> train/eval split — writing
ONE auditable manifest.

    spark-submit --py-files cvocr_spark.zip run_curation_job.py \
        <input documents dir> <manifest output dir> [eval documents dir]

The manifest has a row for EVERY input doc (keep, drop_reasons incl.
'duplicate'/'contaminated'/'no_text', cluster, split, script, PII
counts, scrubbed text).  Deterministic: re-running over the same input
produces a byte-identical manifest.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    eval_dir = sys.argv[3] if len(sys.argv) > 3 else None

    from cvocr_spark.plans.curate import curate_corpus, release
    from cvocr_spark.session import ensure_shipped

    spark = SparkSession.builder.appName("cvocr-curate").getOrCreate()
    ensure_shipped(spark)
    docs = spark.read.parquet(inp)
    ev = spark.read.parquet(eval_dir) if eval_dir else None
    manifest = curate_corpus(docs, ev)
    manifest.write.mode("overwrite").parquet(out)
    release(manifest)  # drop the cached survivors frame (see curate.py)
    kept = spark.read.parquet(out).filter("keep").count()
    total = spark.read.parquet(out).count()
    print({"total": total, "kept": kept})
    spark.stop()


if __name__ == "__main__":
    main()
