"""NULL / empty / degenerate text through the corpus operators, checked
CROSS-ENGINE against each operator's own contract oracle SQL — real
crawls contain null and empty bodies, the synthetic corpus doesn't, and
round 3 found two engine-level NULL divergences in the portable
builders (NOTES.md parity traps 6-7), so this surface stays pinned."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import dedup, textstats  # noqa: E402

NASTY = [
    (1, None),
    (2, ""),
    (3, " "),
    (4, "   \t\n  "),
    (5, "one"),
    (6, "one two"),
    (7, "a normal looking document with several plain words in it"),
    (8, "repeat repeat repeat repeat repeat repeat repeat repeat"),
    (9, "!!! ??? ... ,,, ;;; :::"),
    (10, "x" * 5000),  # one enormous unbroken token
    (11, ("word " * 1500).strip()),  # long but normal
]


@pytest.fixture(scope="module")
def engines(spark):
    docs = spark.createDataFrame(NASTY, "doc_id bigint, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", NASTY)
    return docs, con


def _cmp(sdf, con, sql):
    got = sorted(
        tuple(str(v) for _, v in sorted(r.asDict().items())) for r in sdf.collect()
    )
    want = sorted(
        tuple(str(v) for _, v in sorted(d.items()))
        for d in con.execute(sql).fetch_arrow_table().to_pylist()
    )
    assert got == want and len(got) > 0


def test_token_stats_nulls(engines):
    docs, con = engines
    _cmp(textstats.token_stats(docs), con, textstats.TOKEN_STATS_SQL)


def test_quality_score_nulls(engines):
    docs, con = engines
    _cmp(textstats.quality_score(docs), con, textstats.QUALITY_SCORE_SQL)


def test_lang_id_nulls(engines):
    docs, con = engines
    _cmp(textstats.lang_id(docs), con, textstats.LANG_ID_SQL)


def test_doc_fingerprint_nulls(engines):
    docs, con = engines
    _cmp(textstats.doc_fingerprint(docs), con, textstats.doc_fingerprint_sql())


def test_repetition_stats_nulls(engines):
    docs, con = engines
    _cmp(textstats.repetition_stats(docs), con, textstats.repetition_stats_sql())


def test_corpus_filter_nulls(engines):
    docs, con = engines
    _cmp(textstats.corpus_filter(docs), con, textstats.corpus_filter_sql())


def test_dedup_exact_nulls(engines):
    docs, con = engines
    _cmp(dedup.exact_dedup(docs), con, dedup.exact_dedup_sql("SELECT * FROM documents"))


def test_dedup_incremental_nulls(spark, engines):
    """NULL/empty/degenerate texts through BOTH sides of incremental
    dedup, cross-engine: the oracle's old `h NOT IN (SELECT h ...)`
    silently dropped NULL-hash rows under three-valued logic while the
    Spark left_anti kept them as new_keeper (ADVICE r3) — now NOT
    EXISTS on the oracle side, pinned here with a NULL-text doc in the
    new batch AND a NULL-text doc in the existing corpus."""
    _, con = engines
    existing = spark.createDataFrame(NASTY, "doc_id bigint, text string")
    batch_rows = [
        (101, None),  # NULL text, NULL hash — the NOT IN trap
        (102, ""),  # exact dup of existing id 2
        (107, "a normal looking document with several plain words in it extra"),
        (113, "a brand new document nothing like the others at all here"),
    ]
    newb = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    con.execute("CREATE OR REPLACE TABLE newb_t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO newb_t VALUES (?, ?)", batch_rows)
    sdf = dedup.dedup_incremental(newb, existing)
    _cmp(
        sdf,
        con,
        dedup.dedup_incremental_sql("SELECT * FROM documents", "SELECT * FROM newb_t"),
    )
    rows = {r["doc_id"]: r["status"] for r in sdf.collect()}
    assert len(rows) == len(batch_rows)  # the NULL-text doc was not dropped
    assert rows[102] == "dup_exact"


NASTY_EVENTS = [
    (1, "2024-01-01 12:00:00", 10, "view", 1.0, "{}"),
    (2, None, 10, "view", 2.0, "{}"),  # NULL ts
    (3, "2024-01-01 12:00:00", None, "click", 3.0, "{}"),  # all-NULL users in grp
    (4, "2024-01-01 12:00:00", 11, None, None, None),  # NULL type/value/props
    (None, "2024-01-01 12:00:00", 11, "view", 5.0, "{}"),  # NULL event_id
]
EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def test_events_operators_survive_nulls(spark):
    """NULL ids / timestamps / types / values through every events-table
    operator — none may throw (ANSI division and comparison semantics
    make several of these latent stage-killers; kmv_distinct_sketch's
    rel_err did throw on an all-NULL-user group before the nullif)."""
    import datetime

    from cvocr_spark.operators import asof, temporal, windows

    rows = [
        (e, datetime.datetime.fromisoformat(t) if t else None, u, y, v, p)
        for e, t, u, y, v, p in NASTY_EVENTS
    ]
    ev = spark.createDataFrame(rows, EVENTS_DDL)
    for fn in (
        windows.sessionize,
        windows.gaps_islands,
        windows.neighbor_relabel,
        windows.tumbling_window_agg,
        temporal.range_join_events,
        temporal.rollup_cascade,
        temporal.kmv_distinct_sketch,
        asof.asof_join_marks,
    ):
        fn(ev).collect()  # must not raise

    # the fixed case, cross-engine: all-NULL-user group -> exact 0,
    # rel_err NULL on BOTH engines
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE events ({EVENTS_DDL.replace(' string', ' varchar')})")
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", NASTY_EVENTS)
    got = sorted(
        tuple(str(v) for _, v in sorted(r.asDict().items()))
        for r in temporal.kmv_distinct_sketch(ev).collect()
    )
    want = sorted(
        tuple(str(v) for _, v in sorted(d.items()))
        for d in con.execute(temporal.kmv_distinct_sketch_sql())
        .fetch_arrow_table()
        .to_pylist()
    )
    assert got == want and len(got) > 0


def test_multimodal_null_text_as_empty_payload(spark):
    """NULL text through the multimodal blob path killed the Python
    worker (None.encode) — now treated as an empty payload on both
    engines, consistent with the NULL-text-behaves-like-empty rule."""
    import duckdb

    from cvocr_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world")], "doc_id bigint, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(1, None), (2, ""), (3, "hello world")]
    )
    _cmp(multimodal.media_metadata(docs), con, multimodal.MEDIA_METADATA_SQL)
    rows = multimodal.resize_images(docs).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    assert all(r["thumb"] == bytearray(b"") for r in rows if r["doc_id"] in (1, 2))


def test_ann_operators_survive_degenerate_vectors(spark):
    """One ragged or NULL embedding must not kill a crawl-scale ANN
    stage: under ANSI (Spark 4 default) element_at past the array end
    THROWS — with_bucket and the IVF quantizer now drop non-well-formed
    vectors instead (caught as a real crash by this probe in r3)."""
    from cvocr_spark.operators import ivf, similarity

    DIM = similarity.DIM
    rows = [
        (1, [0.1] * DIM),
        (2, [0.2] * DIM),
        (3, [0.0] * DIM),  # zero vector: norm 0
        (4, None),  # NULL embedding
        (5, [0.1] * 10),  # ragged
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    pairs = similarity.cosine_neardup_pairs(emb).collect()
    assert {v for r in pairs for v in (r["a"], r["b"])} <= {1, 2, 3}
    topk = similarity.lsh_ann_topk(emb, n_queries=2, k=2).collect()
    assert len(topk) > 0
    clusters = similarity.embedding_dedup_clusters(emb).collect()
    assert len(clusters) == len(rows)  # malformed rows stay singletons

    centroids = ivf._train(emb, k=2, iters=1)
    assert len(centroids) == 2
    assigned = ivf.assign_with_dists(emb, centroids).collect()
    assert {r["vec_id"] for r in assigned} == {1, 2, 3}
