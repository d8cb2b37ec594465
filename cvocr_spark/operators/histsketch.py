"""Mergeable log2-bucket histogram + quantiles — the distribution
sketch a corpus-health dashboard needs (doc-length p50/p95/p99 per
source, token-count tails per language) at any scale.

Unlike t-digest/KLL, the log-bucket histogram is fully DETERMINISTIC:
bucket = bit_length(x) = floor(log2(x)) + 1, computed as
length(bin(x)) — exact integer arithmetic, identical in both engines
(same trick as the HLL rho, temporal.py).  Bucket counts merge by SUM,
so the partial/final HashAggregate pair IS the sketch's mergeability
(map-side combine ships at most ~64 bucket rows per group per task —
the same partial/mergeable contract as the KMV and HLL sketches).
Quantiles resolve to the bucket's value range [2^(b-1), 2^b), i.e. a
2x relative error bound — the honest trade for bit-exact determinism
and O(log(max)) state; tighten by scaling x before bucketing.

The quantile rank test uses integer cross-multiplication
(100*cum >= q*total), never a float threshold — exact cross-engine
(pinned in tests/test_histsketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def log2_histogram(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(grp, bucket, n): bucket = bit_length(value); values < 0 and
    NULL are dropped (a size can't be negative; COUNT semantics ignore
    NULL), 0 shares bucket 1 with value 1 ('0' and '1' are both one
    bin digit — documented edge, irrelevant for length-like data)."""
    return (
        df.filter(F.col(value_col) >= 0)
        .select(
            F.col(group_col).alias("grp"),
            F.length(F.bin(F.col(value_col).cast("bigint"))).alias("bucket"),
        )
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("n"))
    )


def log2_histogram_sql(table: str, group_col: str, value_col: str) -> str:
    return f"""
    SELECT {group_col} AS grp,
           cast(length(bin(cast({value_col} as bigint))) as int) AS bucket,
           count(*) AS n
    FROM {table} WHERE {value_col} >= 0
    GROUP BY 1, 2
    """


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Union any number of partial histograms: bucket-wise SUM (per
    partition, per day, per table — never re-reads raw data)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("grp", "bucket").agg(F.sum("n").alias("n"))


def hist_quantiles(hist: DataFrame, qs: tuple[int, ...] = (50, 95, 99)) -> DataFrame:
    """(grp, q, value_ub): for each integer percentile q, the smallest
    bucket whose cumulative count reaches q% of the group total,
    reported as the bucket's exclusive upper bound 2^bucket - 1 (the
    largest value the bucket can hold).  Rank test is exact integer
    cross-multiplication; one window cumsum per group (the histogram
    is tiny — <=64 rows per group — so the window is driver-cheap at
    any corpus scale)."""
    w = Window.partitionBy("grp").orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("grp"))
    )
    # percentile list attached by exploding a literal array — no join
    # (keeps the repo's no-crossJoin invariant; the array is O(len(qs)))
    hit = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(int(q)).cast("int") for q in qs]))
    ).filter(F.col("cum") * 100 >= F.col("q") * F.col("total"))
    return (
        hit.groupBy("grp", "q")
        .agg(F.min("bucket").alias("b"))
        .select(
            "grp",
            "q",
            F.expr("shiftleft(1L, b) - 1L").alias("value_ub"),
        )
    )


def hist_quantiles_sql(
    hist_sql: str, qs: tuple[int, ...] = (50, 95, 99)
) -> str:
    qvals = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH h AS ({hist_sql}),
    c AS (
      SELECT grp, bucket, n,
             sum(n) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
             sum(n) OVER (PARTITION BY grp) AS total
      FROM h
    ),
    qs(q) AS (VALUES {qvals}),
    hit AS (
      SELECT grp, q, min(bucket) AS b
      FROM c CROSS JOIN qs
      WHERE cum * 100 >= q * total
      GROUP BY grp, q
    )
    SELECT grp, q, cast((1::BIGINT << b) - 1 as bigint) AS value_ub FROM hit
    """
