"""Tuned SparkSession builder (SURVEY §4 physical-plan rows).

One place for the configs that matter at scale:
  * AQE on (runtime re-plan, skew-join splitting) — backstop for the
    relational joins; the extraction stage's skew is handled explicitly
    by salted repartitioning (plans/job.py).
  * Arrow batch size tuned for ~6-30 MB per batch: measured on the
    bench corpus (1.6 KB/doc), 256-row batches halve 32-core extraction
    throughput vs 4096 (33k vs 59k docs/s) — the per-batch JVM<->Python
    round-trip dominates a fast kernel.  Rule: maxRecordsPerBatch ~=
    target_batch_bytes / avg_row_bytes; for 100 KB crawl pages that is
    ~256 rows, for this corpus ~4096.
  * shuffle partitions scaled with cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def build_session(
    app: str = "cvocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 4096,
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
        # catalog tables (the Spark-native bucketing path, tableio.py)
        # land in a temp warehouse, never the repo working dir
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "cvocr_warehouse"),
            ),
        )
        .getOrCreate()
    )


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the cvocr_spark package to Python workers (the local-mode
    equivalent of `spark-submit --py-files cvocr_spark.zip`).  Without
    this, mapInArrow/mapInPandas closures that reference module
    functions fail to unpickle on workers whose sys.path lacks the repo.
    Idempotent per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_cvocr_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "cvocr_spark_pyfiles.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "cvocr_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._cvocr_shipped = True
