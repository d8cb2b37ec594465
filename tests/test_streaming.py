"""Structured Streaming extraction (SURVEY §2g streaming row): new page
files flow through the SAME kernel into an append sink; output equals
the batch path exactly."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.fixtures import gen_pages_df  # noqa: E402
from cvocr_spark.plans.job import extract_pages  # noqa: E402
from cvocr_spark.streaming import extract_pages_stream  # noqa: E402


def test_stream_matches_batch(spark):
    d = tempfile.mkdtemp(prefix="cvocr_stream_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = gen_pages_df(spark, docs).cache()
        in_dir, out_dir, ckpt = d + "/in", d + "/out", d + "/ckpt"
        # two separate file drops (two micro-batch triggers minimum)
        pages.filter("length(url) % 2 = 0").write.mode("overwrite").parquet(in_dir)
        pages.filter("length(url) % 2 = 1").write.mode("append").parquet(in_dir)

        q = (
            extract_pages_stream(spark, in_dir, max_files_per_trigger=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        streamed = spark.read.parquet(out_dir).select("url", "text")
        batch = extract_pages(spark.read.parquet(in_dir), salted=False).select(
            "url", "text"
        )
        assert streamed.count() == pages.count()
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0
        pages.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)
