"""URL parsing + domain rollup: cross-engine equality on a corpus of
real-shaped AND degenerate urls (the crawl always has garbage)."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import urlstats  # noqa: E402

URLS = [
    (1, "https://example.com/a/b/c.html", 1200),
    (2, "http://example.com/", 300),
    (3, "https://sub.example.co.uk/path?q=1#frag", 800),
    (4, "https://example.com:8080/a", 500),
    (5, "ftp://files.example.org/pub/x", 50),
    (6, "not a url at all", 10),
    (7, "", 5),
    (8, None, None),
    (9, "https://example.com", 900),  # no path
    (10, "https://xn--bcher-kva.tld/b", 70),  # punycode host
]


def _engines(spark):
    sdf = spark.createDataFrame(URLS, "doc_id bigint, url string, n_chars bigint")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, url VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", URLS)
    return sdf, con


def _rows(x):
    return sorted(
        tuple(str(v) for _, v in sorted(d.items()))
        for d in x
    )


def test_url_parts_cross_engine(spark):
    sdf, con = _engines(spark)
    got = _rows(r.asDict() for r in urlstats.url_parts(sdf).collect())
    want = _rows(
        con.execute(urlstats.url_parts_sql("t")).fetch_arrow_table().to_pylist()
    )
    assert got == want
    by_id = {r["doc_id"]: r for r in urlstats.url_parts(sdf).collect()}
    assert by_id[1]["host"] == "example.com" and by_id[1]["path_depth"] == 3
    assert by_id[3]["host"] == "sub.example.co.uk" and by_id[3]["tld"] == "uk"
    assert by_id[4]["host"] == "example.com:8080"  # port kept: distinct origin
    assert by_id[6]["host"] == "" and by_id[6]["path"] == ""  # garbage kept
    assert by_id[8]["host"] is None  # NULL propagates
    assert by_id[9]["path_depth"] == 0


def test_domain_rollup_cross_engine(spark):
    sdf, con = _engines(spark)
    parts = urlstats.url_parts(sdf)
    got = _rows(r.asDict() for r in urlstats.domain_rollup(parts).collect())
    want = _rows(
        con.execute(urlstats.domain_rollup_sql(urlstats.url_parts_sql("t")))
        .fetch_arrow_table()
        .to_pylist()
    )
    assert got == want
    by_host = {r["host"]: r for r in urlstats.domain_rollup(parts).collect()}
    assert by_host["example.com"]["n_docs"] == 3
    assert by_host["example.com"]["max_depth"] == 3
    assert "" in by_host  # the garbage bucket is counted, not dropped


def test_domain_rollup_plan_is_partial_aggregate(spark):
    """The rollup must carry map-side partial aggregation — a hot host
    ships one partial row per task, never its row set."""
    sdf, _ = _engines(spark)
    plan = (
        urlstats.domain_rollup(urlstats.url_parts(sdf))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2, plan[:2000]
