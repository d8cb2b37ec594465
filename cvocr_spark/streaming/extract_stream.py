"""Structured Streaming wrapper of the extraction kernel.

The reference's only 'streaming' is a blocking request/response Tornado
server (/root/reference/upload.py:34-76 — SURVEY §2a S6); the graft's
continuous-ingest analogue is a file-source stream over the pages
table: new parquet files landing in the input directory (e.g. a crawl
dropping WARC-derived batches) flow through the SAME mapInArrow kernel
— mapInArrow composes with streaming DataFrames unchanged — into an
append-only extracted sink with checkpointed exactly-once semantics.

At scale this is the incremental path beside the batch backfill
(plans/job.py): same kernel, same output schema, Spark's checkpoint
dir playing the role the lineage manifest plays for batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..kernel import DEFAULT_CONFIG, KernelConfig
from ..plans.job import EXTRACTED_DDL, extraction_kernel_arrow

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def extract_pages_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: KernelConfig = DEFAULT_CONFIG,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming pages-dir -> streaming extracted DataFrame."""
    pages = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    slim = pages.select("url", "warc_ts", "html").filter(
        "html IS NOT NULL AND length(html) > 0"
    )
    return slim.mapInArrow(extraction_kernel_arrow(cfg), schema=EXTRACTED_DDL)


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: KernelConfig = DEFAULT_CONFIG,
):
    """Start the continuous extraction job; returns the StreamingQuery.
    Exactly-once into the sink via the checkpoint dir."""
    ext = extract_pages_stream(spark, input_dir, cfg)
    return (
        ext.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
