"""Core relational operators (SURVEY §2c/§2d/§2f): filtered means,
conditional counts, histogram top-k, two-pass variance, equi-joins,
rollup, set ops — each the graft of a reference aggregation/classifier
pass, each with its DuckDB oracle SQL.

Numeric determinism policy (the driver hashes values): no raw double
SUMs ever cross the engine boundary — doubles are first quantized to
integers (round(x*1000)) or cast to DECIMAL so both engines aggregate
exactly; divisions happen once, at the end, in double, then round(4).

Scale notes: every aggregation here is partial-aggregable (map-side
combine comes free from Catalyst); the orders⋈customer join broadcasts
the dimension side explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filtered_mean(docs: DataFrame, min_chars: int = 100) -> DataFrame:
    """A2 filtered mean (cut.h:158-185): per-lang mean doc length
    counting only docs >= min_chars — `avg(CASE WHEN ...)`."""
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.when(F.col("n_chars") >= min_chars, F.col("n_chars"))), 4).alias(
            "mean_long"
        ),
        F.sum(F.when(F.col("n_chars") >= min_chars, 1).otherwise(0)).alias("n_long"),
    )


def filtered_mean_sql(min_chars: int = 100) -> str:
    return f"""
    SELECT lang, count(*) AS n_docs,
           round(avg(CASE WHEN n_chars >= {min_chars} THEN n_chars END), 4) AS mean_long,
           cast(sum(CASE WHEN n_chars >= {min_chars} THEN 1 ELSE 0 END) as bigint) AS n_long
    FROM documents GROUP BY lang
    """


def conditional_counts(lineitem: DataFrame) -> DataFrame:
    """A3 conditional counts (cut.h:683-690 count_chi/count_eng
    analogue) + exact decimal sum."""
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_disc"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


CONDITIONAL_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       cast(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) as bigint) AS n_disc,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def histogram_topk(events: DataFrame, k: int = 6) -> DataFrame:
    """A4 histogram + top-k (extract.py:131-141 hue-histogram top-6
    analogue), tie-broken by key for determinism."""
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
        .limit(k)
    )


def histogram_topk_sql(k: int = 6) -> str:
    return f"""
    SELECT event_type, count(*) AS cnt FROM events
    GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT {k}
    """


def group_stats_var(events: DataFrame) -> DataFrame:
    """A5 mean/variance (cut.h:558-630): computed from exact integer
    sums of milli-quantized values, variance via the two-moment formula
    — deterministic across engines and partitionings (a raw var_pop
    over doubles is merge-order-dependent)."""
    z = F.round(F.col("value") * 1000).cast("bigint")
    agged = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(z).alias("s1"),
        F.sum((z * z).cast("double")).alias("s2"),  # z^2 sums may pass 2^63 at scale
    )
    return agged.select(
        "event_type",
        "n",
        F.round(F.col("s1").cast("double") / F.col("n") / 1000.0, 4).alias("mean_val"),
        F.round(
            (
                F.col("s2")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
            )
            / F.col("n")
            / 1000000.0,
            2,
        ).alias("var_val"),
    )


GROUP_STATS_VAR_SQL = """
WITH q AS (
  SELECT event_type, cast(round(value * 1000) as bigint) AS z FROM events
), m AS (
  SELECT event_type, count(*) AS n, cast(sum(z) as bigint) AS s1,
         sum(cast(z as double) * cast(z as double)) AS s2
  FROM q GROUP BY event_type
)
SELECT event_type, n,
       round(cast(s1 as double) / n / 1000.0, 4) AS mean_val,
       round((s2 - cast(s1 as double) * cast(s1 as double) / n) / n / 1000000.0, 2) AS var_val
FROM m
"""


def equi_join_agg(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """C5 equi-join (the graft's golden-vs-extracted join pattern):
    fact ⋈ broadcast(dim) → agg.  customer is the small side —
    broadcast explicitly, no shuffle of orders on the join key."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


EQUI_JOIN_AGG_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def rollup_counts(docs: DataFrame) -> DataFrame:
    """Grouping-sets capability (SURVEY §2g row): rollup(lang, source)."""
    return docs.rollup("lang", "source").agg(F.count("*").alias("n"))


ROLLUP_COUNTS_SQL = """
SELECT lang, source, count(*) AS n FROM documents GROUP BY ROLLUP (lang, source)
"""


def union_distinct(docs: DataFrame) -> DataFrame:
    """Set ops (SURVEY §2g): distinct union of two projections."""
    return (
        docs.select(F.col("lang").alias("v"))
        .union(docs.select(F.col("source").alias("v")))
        .distinct()
    )


UNION_DISTINCT_SQL = """
SELECT lang AS v FROM documents UNION SELECT source AS v FROM documents
"""
