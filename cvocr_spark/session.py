"""Tuned SparkSession builder (SURVEY §4 physical-plan rows).

One place for the configs that matter at scale:
  * AQE on (runtime re-plan, skew-join splitting) — backstop for the
    relational joins; the extraction stage's skew is handled explicitly
    by salted repartitioning (plans/job.py).
  * Arrow batch size tuned DOWN (rows carry multi-KB html blobs;
    SURVEY §4 "batch amortization" row).
  * shuffle partitions scaled with cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app: str = "cvocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 256,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)
    return (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
