"""Eval-set decontamination: cross-engine equality, correctness of the
overlap semantics, and the broadcast-semi-join plan shape."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import decontam  # noqa: E402

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated text about cooking lentil soup slowly"),
    (3, "prefix words then the quick brown fox jumps over everything"),  # shares a 5-gram with eval 100
    (4, "short doc"),  # < n words: no n-grams
    (5, None),  # NULL text
    (6, "the quick brown fox jumps"),  # exactly n words, equals an eval shingle
]
EVAL = [
    (100, "watch the quick brown fox jumps over the fence"),
    (101, "another benchmark prompt entirely about astronomy and orbits"),
]


def _duck(sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs_t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs_t VALUES (?, ?)", DOCS)
    con.execute("CREATE TABLE eval_t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO eval_t VALUES (?, ?)", EVAL)
    return con.execute(sql).fetch_arrow_table().to_pylist()


def test_decontaminate_cross_engine_and_semantics(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    ev = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["is_contaminated"]
        for r in decontam.decontaminate(docs, ev).collect()
    }
    want = {
        d["doc_id"]: d["is_contaminated"]
        for d in _duck(
            decontam.decontaminate_sql("SELECT * FROM docs_t", "SELECT * FROM eval_t")
        )
    }
    assert got == want
    assert len(got) == len(DOCS)  # every doc flagged, incl. NULL/short
    # doc 1 and 3 share 'the quick brown fox jumps' (+ more) with eval 100
    assert got[1] and got[3] and got[6]
    assert not got[2] and not got[4] and not got[5]


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The eval n-gram set must reach the corpus side as a BROADCAST
    semi-join — the corpus never shuffles on gram hash at scale."""
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    ev = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    plan = (
        decontam.decontaminate(docs, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:3000]
