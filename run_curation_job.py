#!/usr/bin/env python
"""spark-submit entry point: the composed curation pipeline
(plans/curate.py) over a documents table — hygiene -> quality gates ->
dedup -> optional eval-set decontamination -> train/eval split — writing
ONE auditable manifest.

    spark-submit --py-files cvocr_spark.zip run_curation_job.py \
        <input documents dir> <manifest output dir> [eval documents dir] \
        [--dedup-index <path>]

--dedup-index is the train/serve switch (r5): the survivors' LSH band
table is materialized there once per corpus generation and the pair
stage is served from it on re-runs (byte-identical manifests).

The manifest has a row for EVERY input doc (keep, drop_reasons incl.
'duplicate'/'contaminated'/'no_text', cluster, split, script, PII
counts, scrubbed text).  Deterministic: re-running over the same input
produces a byte-identical manifest.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = list(sys.argv[1:])
    idx = None
    if "--dedup-index" in args:
        i = args.index("--dedup-index")
        idx = args[i + 1]
        del args[i : i + 2]
    inp, out = args[0], args[1]
    eval_dir = args[2] if len(args) > 2 else None

    from cvocr_spark.plans.curate import curate_corpus, release
    from cvocr_spark.session import ensure_shipped

    spark = SparkSession.builder.appName("cvocr-curate").getOrCreate()
    ensure_shipped(spark)
    docs = spark.read.parquet(inp)
    ev = spark.read.parquet(eval_dir) if eval_dir else None
    manifest = curate_corpus(docs, ev, dedup_index_path=idx)
    manifest.write.mode("overwrite").parquet(out)
    release(manifest)  # drop the cached survivors frame (see curate.py)
    kept = spark.read.parquet(out).filter("keep").count()
    total = spark.read.parquet(out).count()
    print({"total": total, "kept": kept})
    spark.stop()


if __name__ == "__main__":
    main()
