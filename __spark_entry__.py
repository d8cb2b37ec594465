"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in cvocr_spark/ (contract.py assembles the table);
this file stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cvocr_spark.contract import build_contract  # noqa: E402

_CONTRACT = build_contract()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Stage-A extraction over Common-Crawl-style pages
    generated from sf0.001 documents — salted repartition, one
    mapInArrow kernel stage, extracted text + char-span offsets."""
    from cvocr_spark.fixtures import gen_pages_df
    from cvocr_spark.plans.job import extract_pages
    from cvocr_spark.session import ensure_shipped

    ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = gen_pages_df(spark, docs)
    ext = extract_pages(pages)
    return ext.select("url", "warc_ts", "text", "n_blocks", "score")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _CONTRACT.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _CONTRACT.items() if sql is not None}
