"""Spark-path tests (SURVEY §5 items 3, 6): mapInArrow output ==
pure-kernel goldens byte-for-byte, invariance across partition counts,
and kill/resume lineage semantics."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.fixtures import gen_pages_df, gen_pages_table  # noqa: E402
from cvocr_spark.plans.job import extract_pages  # noqa: E402
from cvocr_spark.sources.tableio import run_extraction  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "0.001"


@pytest.fixture(scope="module")
def pages(spark):
    docs = spark.read.parquet(f"/root/testdata/sf{SF}/documents.parquet")
    return gen_pages_df(spark, docs)


def _golden_map():
    g = pq.read_table(os.path.join(HERE, "goldens", f"golden_sf{SF}.parquet"))
    return {
        g.column("url")[i].as_py(): (
            g.column("text")[i].as_py(),
            g.column("spans")[i].as_py(),
        )
        for i in range(g.num_rows)
    }


def test_spark_matches_goldens_byte_identical(spark, pages):
    golden = _golden_map()
    rows = extract_pages(pages, n_partitions=8).select("url", "text", "spans").collect()
    assert len(rows) == len(golden)
    for r in rows:
        gtext, gspans = golden[r["url"]]
        assert r["text"] == gtext, f"text mismatch for {r['url']}"
        got_spans = [s.asDict() for s in r["spans"]]
        assert got_spans == gspans, f"span mismatch for {r['url']}"


def test_partition_count_invariance(spark, pages):
    a = extract_pages(pages, n_partitions=2).select("url", "text").collect()
    b = extract_pages(pages, n_partitions=17).select("url", "text").collect()
    assert sorted((r["url"], r["text"]) for r in a) == sorted(
        (r["url"], r["text"]) for r in b
    )


def test_resume_after_partial_run(spark, pages):
    d = tempfile.mkdtemp(prefix="cvocr_resume_")
    try:
        out, out_solo = d + "/ext", d + "/ext_solo"
        # killed run: only 3 buckets commit
        r1 = run_extraction(spark, pages, out, n_buckets=12, max_buckets=3, run_id="r1")
        assert r1["buckets_committed_now"] == 3
        # resume: remaining buckets only
        r2 = run_extraction(spark, pages, out, n_buckets=12, run_id="r2")
        assert r2["buckets_committed_before"] == 3
        assert r2["buckets_committed_now"] == 9
        # resumed result == single-shot result, byte-for-byte
        run_extraction(spark, pages, out_solo, n_buckets=12, run_id="solo")
        resumed = spark.read.parquet(out).select("url", "text")
        solo = spark.read.parquet(out_solo).select("url", "text")
        assert resumed.exceptAll(solo).count() == 0
        assert solo.exceptAll(resumed).count() == 0
        # no bucket processed twice
        mani = spark.read.parquet(out + "_manifest")
        assert mani.count() == mani.select("bucket").distinct().count()
        # third run: nothing pending
        r3 = run_extraction(spark, pages, out, n_buckets=12, run_id="r3")
        assert r3["buckets_committed_now"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_spark_gen_matches_local_gen(spark, pages):
    local = gen_pages_table(f"/root/testdata/sf{SF}/documents.parquet")
    local_map = {
        local.column("url")[i].as_py(): local.column("html")[i].as_py()
        for i in range(local.num_rows)
    }
    rows = pages.select("url", "html").collect()
    assert len(rows) == len(local_map)
    for r in rows:
        assert bytes(r["html"]) == local_map[r["url"]]


def test_blocks_table_matches_kernel(spark, pages):
    from cvocr_spark.kernel import extract
    from cvocr_spark.plans.job import extract_blocks

    sample = pages.limit(20).cache()
    rows = extract_blocks(sample).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    for pr in sample.select("url", "html").collect():
        kb = extract(bytes(pr["html"])).blocks
        got = sorted(by_url[pr["url"]], key=lambda r: r["block_id"])
        assert len(got) == len(kb)
        for g, b in zip(got, kb):
            assert (g["block_id"], g["tag"], g["text"], g["cls"]) == (
                b.block_id, b.tag, b.text, b.cls
            )
    sample.unpersist()


def test_salted_repartition_balances_host_skew(spark):
    """north_rule skew defense: a corpus where ONE host owns 60% of the
    urls must still spread ~uniformly across partitions after the
    salted repartition (host clustering must not pin executors)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    skewed = gen_pages_df(spark, docs).withColumn(
        "url",
        F.when(
            F.rand(42) < 0.6,  # 60% of urls on one giant host
            F.concat(F.lit("https://megahost.example.com/p/"), F.col("url")),
        ).otherwise(F.col("url")),
    )
    from cvocr_spark.plans.job import extract_pages

    parts = (
        extract_pages(skewed, n_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in parts]
    assert len(counts) == 16
    mean = sum(counts) / len(counts)
    assert max(counts) < 1.6 * mean, f"skewed partitions: {sorted(counts)}"


def test_kernel_idempotent_on_own_output(spark):
    """SURVEY §5 item 5: re-extracting the extracted text (wrapped as a
    trivial page) reproduces it — the kernel is a projection."""
    from cvocr_spark.kernel import extract

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.limit(50).collect()]
    for t in texts:
        once = extract(f"<html><body><article><p>{t}</p></article></body></html>".encode())
        twice = extract(
            f"<html><body><article><p>{once.text}</p></article></body></html>".encode()
        )
        assert once.text.replace("\n", " ") == t
        assert twice.text.replace("\n", " ") == once.text.replace("\n", " ")


def test_prefilter_prunes_empty_html(spark):
    pdf = spark.createDataFrame(
        [("u1", None), ("u2", b"")],
        "url string, html binary",
    ).withColumn("warc_ts", F.current_timestamp())
    assert extract_pages(pdf, salted=False).count() == 0


def test_debug_sample_sink_deterministic(spark, pages):
    """The 1-in-N debug blocks sink (reference debug artifacts,
    preprocess.h:532-534): deterministic url sample, full block schema,
    same urls on a re-run."""
    from cvocr_spark.sources.tableio import write_debug_sample

    d = tempfile.mkdtemp(prefix="cvocr_dbg_")
    try:
        write_debug_sample(pages, d + "/s1", one_in=10)
        write_debug_sample(pages, d + "/s2", one_in=10)
        s1 = spark.read.parquet(d + "/s1")
        urls1 = {r["url"] for r in s1.select("url").distinct().collect()}
        urls2 = {
            r["url"]
            for r in spark.read.parquet(d + "/s2").select("url").distinct().collect()
        }
        assert urls1 == urls2 and urls1  # deterministic, non-empty
        n_pages = pages.count()
        assert len(urls1) < n_pages / 5  # actually a sample
        # full blocks schema incl. the confidence columns
        for col in ("block_id", "cls", "conf", "candidates", "link_density"):
            assert col in s1.columns
    finally:
        shutil.rmtree(d, ignore_errors=True)
