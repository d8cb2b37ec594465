"""Spark-native bucketed tables: co-located joins and aggregations must
run WITHOUT a runtime exchange — the storage-layout-beats-shuffle
contract of the 100-TB design, pinned in the physical plan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.sources.tableio import write_bucketed_table  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_and_agg_have_no_exchange(spark):
    from pyspark.sql import functions as F

    from cvocr_spark.fixtures import gen_pages_df
    from cvocr_spark.plans.job import extract_blocks, extract_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    pages = gen_pages_df(spark, docs)
    write_bucketed_table(extract_pages(pages, salted=False), "t_docs_b", "url", 8)
    write_bucketed_table(extract_blocks(pages), "t_blocks_b", "url", 8)

    d = spark.table("t_docs_b")
    b = spark.table("t_blocks_b")

    # at the fixture scale Catalyst would broadcast (both sides tiny);
    # disable that to exercise the big-big join bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # doc <-> blocks equi-join on the bucket key: NO exchange anywhere
        joined = d.select("url", "n_blocks").join(b.select("url", "block_id"), "url")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan[:2500]
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan[:2500]

        # per-url aggregation: bucketing satisfies the partial/final
        # split without an exchange too
        agg = b.groupBy("url").agg(F.count("*").alias("n"))
        aplan = _plan(agg)
        assert "Exchange" not in aplan, "bucketed agg still shuffles:\n" + aplan[:2500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # same results as the unbucketed path (layout is transparent)
    want = (
        extract_blocks(pages).groupBy("url").agg(F.count("*").alias("n")).collect()
    )
    assert sorted((r["url"], r["n"]) for r in agg.collect()) == sorted(
        (r["url"], r["n"]) for r in want
    )

    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_blocks_b")


def test_bucketed_qualified_name_and_torn_location(spark):
    """ADVICE r4: for a db-qualified table the stale-location recovery
    must resolve {warehouse}/{db}.db/{tbl} (via the catalog when the
    entry exists), not {warehouse}/{db}.{tbl} — a torn write (files on
    disk, catalog entry dropped) must rewrite cleanly, not throw
    LOCATION_ALREADY_EXISTS."""
    import shutil
    from urllib.parse import urlparse

    df = spark.createDataFrame(
        [(f"u{i}", i) for i in range(20)], "url string, v int"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS qdb")
    try:
        write_bucketed_table(df, "qdb.t_q", "url", 4)
        assert spark.table("qdb.t_q").count() == 20

        # rewrite while the catalog entry EXISTS: location from catalog
        write_bucketed_table(df, "qdb.t_q", "url", 4)
        assert spark.table("qdb.t_q").count() == 20

        # torn case: catalog entry gone, location files still present
        loc = next(
            r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED qdb.t_q").collect()
            if r["col_name"] == "Location"
        )
        path = urlparse(loc).path
        spark.sql("DROP TABLE qdb.t_q")
        os.makedirs(path, exist_ok=True)  # stale files at the REAL location
        with open(os.path.join(path, "stale.parquet"), "w") as f:
            f.write("x")
        write_bucketed_table(df, "qdb.t_q", "url", 4)  # must self-heal
        assert spark.table("qdb.t_q").count() == 20
    finally:
        spark.sql("DROP TABLE IF EXISTS qdb.t_q")
        spark.sql("DROP DATABASE IF EXISTS qdb")
        shutil.rmtree("/tmp/qdb.db", ignore_errors=True)
