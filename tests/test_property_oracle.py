"""Property-based cross-engine equivalence: operators with RANDOMIZED
parameters must match DuckDB exactly — guards against thresholds that
happen to work at the default settings only (hypothesis generates the
parameter sweeps, seeded)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"  # smallest: these run many times


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _cmp(spark_df, duck_con, sql):
    cols = sorted(spark_df.columns)
    s = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()), key=repr
    )
    dt = duck_con.execute(sql).fetch_arrow_table()
    assert cols == sorted(dt.column_names)
    d = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in dt.to_pylist()), key=repr
    )
    assert s == d, f"{len(s)} vs {len(d)} rows; first diff: " + str(
        next((p for p in zip(s, d) if p[0] != p[1]), None)
    )


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=60, max_value=7200))
def test_sessionize_any_gap(spark, duck, gap_s):
    from cvocr_spark.operators.windows import sessionize, sessionize_sql

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _cmp(sessionize(ev, gap_s=gap_s), duck, sessionize_sql(gap_s=gap_s))


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=1, max_value=10))
def test_topk_any_k(spark, duck, k):
    from cvocr_spark.operators.windows import topk_per_group, topk_per_group_sql

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    _cmp(topk_per_group(li, k=k), duck, topk_per_group_sql(k=k))


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=10, max_value=600))
def test_filtered_mean_any_threshold(spark, duck, min_chars):
    from cvocr_spark.operators.relational import filtered_mean, filtered_mean_sql

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _cmp(filtered_mean(docs, min_chars=min_chars), duck, filtered_mean_sql(min_chars))


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=2, max_value=6))
def test_gaps_islands_any_run(spark, duck, min_run):
    from cvocr_spark.operators.windows import gaps_islands, gaps_islands_sql

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _cmp(gaps_islands(ev, min_run=min_run), duck, gaps_islands_sql(min_run=min_run))


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=5))
def test_histogram_any_k(spark, duck, k):
    from cvocr_spark.operators.relational import histogram_topk, histogram_topk_sql

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _cmp(histogram_topk(ev, k=k), duck, histogram_topk_sql(k=k))


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=5, max_value=80))
def test_ordered_assembly_any_prefix(spark, duck, prefix_len):
    from cvocr_spark.operators.windows import (
        ordered_assembly,
        ordered_assembly_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _cmp(
        ordered_assembly(docs, prefix_len=prefix_len),
        duck,
        ordered_assembly_sql(prefix_len=prefix_len),
    )


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=90))
def test_tumbling_window_any_width(spark, duck, minutes):
    # includes non-day-dividing widths (7, 13, ...): catches window
    # origin-alignment divergence between engines
    from cvocr_spark.operators.windows import (
        tumbling_window_agg,
        tumbling_window_agg_sql,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _cmp(
        tumbling_window_agg(ev, minutes=minutes),
        duck,
        tumbling_window_agg_sql(minutes=minutes),
    )


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=30, max_value=600))
def test_range_join_any_window(spark, duck, window_s):
    from cvocr_spark.operators.temporal import (
        range_join_events,
        range_join_events_sql,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _cmp(
        range_join_events(ev, window_s=window_s),
        duck,
        range_join_events_sql(window_s=window_s),
    )
