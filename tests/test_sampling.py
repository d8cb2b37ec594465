"""Deterministic sampling: cross-engine equality (the draw is a pure
function of the key, so Spark and DuckDB must pick the SAME rows),
partition-invariance, and quota exactness."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import sampling  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con.execute(sql).fetch_arrow_table().to_pylist()


def test_hash_sample_cross_engine_and_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 5.0).collect()}
    want = {
        d["doc_id"] for d in _duck(sampling.hash_sample_sql("documents", "doc_id", 5.0))
    }
    assert got == want
    n = docs.count()
    # ~5% with binomial slack
    assert 0.02 * n < len(got) < 0.09 * n
    # membership survives repartitioning (native df.sample does not)
    re = {
        r["doc_id"]
        for r in sampling.hash_sample(docs.repartition(17), "doc_id", 5.0).collect()
    }
    assert re == got


def test_stratified_sample_quota_and_cross_engine(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sampling.stratified_sample(docs, "source", "doc_id", 3).collect()
    by_src: dict[str, set] = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    n_sources = docs.select("source").distinct().count()
    assert len(by_src) == n_sources
    assert all(len(v) == 3 for v in by_src.values())
    want_rows = _duck(sampling.stratified_sample_sql("documents", "source", "doc_id", 3))
    want: dict[str, set] = {}
    for d in want_rows:
        want.setdefault(d["source"], set()).add(d["doc_id"])
    assert by_src == want


def test_split_train_eval_disjoint_exhaustive_cross_engine(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: r["split"]
        for r in sampling.split_train_eval(docs, "doc_id", 10.0).collect()
    }
    assert len(got) == docs.count()  # exhaustive: every row gets a side
    want = {
        d["doc_id"]: d["split"]
        for d in _duck(sampling.split_train_eval_sql("documents", "doc_id", 10.0))
    }
    assert got == want
    n_eval = sum(1 for v in got.values() if v == "eval")
    assert 0.05 * len(got) < n_eval < 0.16 * len(got)
    # independence from the sample operator: different seeds
    sampled = {
        r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 10.0).collect()
    }
    evals = {k for k, v in got.items() if v == "eval"}
    assert sampled != evals  # distinct seeds draw distinct sets


def test_sampling_null_keys(spark):
    """NULL keys: dropped by hash_sample (both engines), assigned
    'train' by split (CASE falls through NULL), never crash."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id bigint, k string"
    )
    kept = sampling.hash_sample(df, "k", 100.0).collect()
    assert {r["doc_id"] for r in kept} == {1, 3}
    split = {r["doc_id"]: r["split"] for r in sampling.split_train_eval(df, "k", 50.0).collect()}
    assert split[2] == "train" and len(split) == 3


def test_stratified_sample_null_key_cross_engine(spark):
    """ADVICE r4: a NULL sampling key hashes to NULL, which Spark's ASC
    default ranks FIRST and DuckDB's ranks LAST — with implicit
    ordering the per-group quota picks different rows cross-engine.
    Both sides now pin NULLS LAST; the NULL-key row fills a quota slot
    only when its group has no non-NULL competitors left."""
    import duckdb

    rows = [(1, "g1", "a"), (2, "g1", None), (3, "g1", "b"), (4, "g1", "c"),
            (5, "g2", None), (6, "g2", "d"),
            (7, "g3", None)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, k string")
    got = {
        (r["grp"], r["doc_id"])
        for r in sampling.stratified_sample(df, "grp", "k", 2).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id bigint, grp varchar, k varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = {
        (d["grp"], d["doc_id"])
        for d in con.execute(
            sampling.stratified_sample_sql("t", "grp", "k", 2)
        ).fetch_arrow_table().to_pylist()
    }
    assert got == want
    # the NULL-key row never displaces a non-NULL row from the quota
    assert (("g1", 2)) not in got
    # but fills the quota when the group lacks non-NULL rows
    assert ("g2", 5) in got and ("g3", 7) in got
