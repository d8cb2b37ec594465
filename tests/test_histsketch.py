"""Log2-bucket histogram sketch: cross-engine equality, merge =
whole-data identity (the mergeability contract), quantile bound
correctness vs exact percentiles."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import histsketch  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def _hkey(rows):
    return {(r["grp"], r["bucket"]): r["n"] for r in rows}


def test_histogram_cross_engine(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _hkey(histsketch.log2_histogram(docs, "source", "n_chars").collect())
    want = {
        (d["grp"], d["bucket"]): d["n"]
        for d in _duck()
        .execute(histsketch.log2_histogram_sql("documents", "source", "n_chars"))
        .fetch_arrow_table()
        .to_pylist()
    }
    assert got == want and len(got) > 0


def test_histogram_merge_equals_whole(spark):
    """Partial histograms over disjoint shards merge (bucket-wise SUM)
    to exactly the whole-data histogram — map-side combine IS this."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    whole = _hkey(histsketch.log2_histogram(docs, "source", "n_chars").collect())
    a = histsketch.log2_histogram(docs.filter("doc_id % 2 = 0"), "source", "n_chars")
    b = histsketch.log2_histogram(docs.filter("doc_id % 2 = 1"), "source", "n_chars")
    merged = _hkey(histsketch.hist_merge(a, b).collect())
    assert merged == whole


def test_quantiles_bound_exact_percentiles(spark):
    """Each reported value_ub must bracket the true percentile within
    the bucket's 2x bound: exact_pq <= value_ub < 2 * exact_pq + 1."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hist = histsketch.log2_histogram(docs, "source", "n_chars")
    got = {
        (r["grp"], r["q"]): r["value_ub"]
        for r in histsketch.hist_quantiles(hist).collect()
    }
    exact = {
        (d["source"], q): d[f"p{q}"]
        for d in _duck()
        .execute(
            "SELECT source, "
            + ", ".join(
                f"cast(quantile_disc(n_chars, {q / 100}) as bigint) AS p{q}"
                for q in (50, 95, 99)
            )
            + " FROM documents GROUP BY source"
        )
        .fetch_arrow_table()
        .to_pylist()
        for q in (50, 95, 99)
    }
    assert set(got) == set(exact)
    for k, ub in got.items():
        assert exact[k] <= ub <= 2 * exact[k] + 1, (k, ub, exact[k])


def test_quantiles_cross_engine(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hist = histsketch.log2_histogram(docs, "source", "n_chars")
    got = sorted(
        (r["grp"], r["q"], r["value_ub"])
        for r in histsketch.hist_quantiles(hist).collect()
    )
    want = sorted(
        (d["grp"], d["q"], d["value_ub"])
        for d in _duck()
        .execute(
            histsketch.hist_quantiles_sql(
                histsketch.log2_histogram_sql("documents", "source", "n_chars")
            )
        )
        .fetch_arrow_table()
        .to_pylist()
    )
    assert got == want


def test_histogram_degenerate_values(spark):
    """0, negatives, NULLs: 0 lands in bucket 1 (documented), negatives
    and NULLs dropped — no ANSI throw, same on both engines."""
    rows = [("g", 0), ("g", 1), ("g", -5), ("g", None), ("g", 1023), ("g", 1024)]
    df = spark.createDataFrame(rows, "src string, v bigint")
    got = _hkey(histsketch.log2_histogram(df, "src", "v").collect())
    assert got == {("g", 1): 2, ("g", 10): 1, ("g", 11): 1}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (src VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        (d["grp"], d["bucket"]): d["n"]
        for d in con.execute(histsketch.log2_histogram_sql("t", "src", "v"))
        .fetch_arrow_table()
        .to_pylist()
    }
    assert got == want
