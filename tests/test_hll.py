"""HLL union sketch (VERDICT r2 item 9): mergeable distinct-count
partials whose union is register-wise max — exactness of the MERGE is
asserted bit-for-bit (that is the property that lets per-day/partition
sketches combine without re-reading raw data); the ESTIMATE is
asserted within the sketch's statistical error bound vs exact."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import temporal  # noqa: E402

SF_DIR = os.environ.get("CVOCR_TEST_SF_DIR", "/root/testdata/sf0.01")


def _regs(df):
    return {(r["grp"], r["register"]): r["max_rho"] for r in df.collect()}


def test_hll_merge_equals_sketch_of_union(spark):
    """sketch(A UNION B) == merge(sketch(A), sketch(B)), register-exact:
    the mergeability contract."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    whole = temporal.hll_partials(ev, "event_type", "cast(user_id as string)")
    merged = temporal.hll_merge(
        temporal.hll_partials(a, "event_type", "cast(user_id as string)"),
        temporal.hll_partials(b, "event_type", "cast(user_id as string)"),
    )
    assert _regs(whole) == _regs(merged)


def test_hll_estimate_within_error_bound(spark):
    """|est - exact| / exact <= 4 sigma (sigma = 1.04/sqrt(256) = 6.5%)
    per group — a deterministic corpus, so this is a frozen fact, not a
    flaky statistical test."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    est = {
        r["grp"]: r["hll_estimate"]
        for r in temporal.hll_estimate(
            temporal.hll_partials(ev, "event_type", "cast(user_id as string)")
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for g, n in exact.items():
        rel = abs(est[g] - n) / n
        assert rel <= 4 * 1.04 / (temporal.HLL_M ** 0.5), (g, est[g], n, rel)


def test_hll_cross_engine_oracle_ready(spark):
    """The DuckDB SQL restatement (hll_partials_sql / hll_estimate_sql)
    must match Spark register-for-register AND estimate-for-estimate —
    the evidence that promoting HLL into the oracled contract is just a
    slot swap."""
    import duckdb

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")

    psql = temporal.hll_partials_sql(
        "events", "event_type", "cast(user_id as varchar)"
    )
    spark_p = temporal.hll_partials(ev, "event_type", "cast(user_id as string)")
    assert _regs(spark_p) == {
        (g, r): m for g, r, m in con.execute(psql).fetchall()
    }

    esql = temporal.hll_estimate_sql(psql)
    spark_e = {
        r["grp"]: r["hll_estimate"]
        for r in temporal.hll_estimate(spark_p).collect()
    }
    assert spark_e == dict(con.execute(esql).fetchall())


def test_hll_null_keys_ignored(spark):
    """COUNT(DISTINCT) ignores NULLs; so must the sketch — a NULL key
    must not register (a group with ONLY null keys gets no partial
    rows and hence no estimate row, not a phantom nonzero one)."""
    import duckdb

    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", None), ("b", None), ("b", None)],
        "grp string, user string",
    )
    p = temporal.hll_partials(df, "grp", "user")
    regs = _regs(p)
    assert all(g == "a" and r is not None for g, r in regs)
    assert len(regs) == 2  # u1, u2
    est = {r["grp"]: r["hll_estimate"] for r in temporal.hll_estimate(p).collect()}
    assert set(est) == {"a"} and abs(est["a"] - 2) < 1

    # oracle side agrees on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, usr VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [("a", "u1"), ("a", "u2"), ("a", None), ("b", None), ("b", None)],
    )
    psql = temporal.hll_partials_sql("t", "grp", "usr")
    assert {(g, r): m for g, r, m in con.execute(psql).fetchall()} == regs
    assert dict(
        con.execute(temporal.hll_estimate_sql(psql)).fetchall()
    ) == est


def test_hll_partials_combine_map_side(spark):
    """The partial plan must be a HashAggregate pair (partial + final):
    the map-side combine IS the scalability — a hot group ships at most
    m register rows per map task, never its raw keys."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (
        temporal.hll_partials(ev, "event_type", "cast(user_id as string)")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2, plan[:2000]
    assert "lambdafunction" not in plan, plan[:2000]
