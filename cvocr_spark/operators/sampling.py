"""Deterministic sampling operators — the reproducibility primitives a
training-data pipeline needs (every ablation and decontamination study
re-draws "the same 1%" months later, on a different cluster, and must
get byte-identical rows back).

Spark's native df.sample() is seed-deterministic only per partitioning
— a repartitioned or grown table re-draws different rows.  These
operators key the draw on CONTENT (the portable 60-bit md5 hash of a
caller-named key column), so membership is a pure function of the row:
stable across partitionings, cluster sizes, engine versions, and even
engines (each has an exact DuckDB restatement, pinned cross-engine in
tests/test_sampling.py).

Scale notes: hash_sample is a stateless filter (pushes down, no
shuffle, trivially parallel).  stratified_sample is one window rank
per group keyed by the hash — the same WindowGroupLimit-partial shape
as topk_per_group (rank<=n prunes map-side before the shuffle), so a
hot group ships at most n rows per map task, never its whole stratum.

Reference analogue: the per-class training-set assembly of the
reference pipeline (gen_data in dump.py) draws fixed-size per-class
samples; here the draw is content-keyed instead of file-order-keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P


def hash_sample(
    df: DataFrame, key: str, pct: float, seed: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~pct% of rows: hash60(seed:key) % 10000 <
    pct*100.  Membership is a pure function of (key, seed) — a row
    keeps its fate when the table is rewritten, repartitioned, or
    unioned with new data (new rows draw independently).  NULL keys
    hash to NULL and are dropped (no silent all-NULL stratum)."""
    bps = int(round(pct * 100))
    h = P.hash60_spark(f"cast({key} as string)", seed)
    return df.filter(F.expr(f"pmod({h}, 10000) < {bps}"))


def hash_sample_sql(table: str, key: str, pct: float, seed: str = "sample") -> str:
    bps = int(round(pct * 100))
    h = P.hash60_duck(f"cast({key} as varchar)", seed)
    return f"SELECT * FROM {table} WHERE ({h}) % 10000 < {bps}"


def stratified_sample(
    df: DataFrame, group_col: str, key: str, n_per_group: int, seed: str = "strat"
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per group, chosen by hash order —
    a deterministic per-class quota (class-balanced training splits,
    per-domain eval slices).  Hash order is uniform within each group,
    so the quota is an unbiased without-replacement draw; ties broken
    by the key itself for full determinism.  NULL keys hash to NULL
    and sort LAST — explicitly, on BOTH engines: Spark's ASC default
    is NULLS FIRST while DuckDB's is NULLS LAST, so an implicit order
    would fill a group's quota with different rows cross-engine
    whenever a NULL sampling key exists (ADVICE r4)."""
    h = F.expr(P.hash60_spark(f"cast({key} as string)", seed))
    w = Window.partitionBy(group_col).orderBy(
        h.asc_nulls_last(), F.col(key).asc_nulls_last()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_group)
        .drop("rn")
    )


def stratified_sample_sql(
    table: str, group_col: str, key: str, n_per_group: int, seed: str = "strat"
) -> str:
    h = P.hash60_duck(f"cast({key} as varchar)", seed)
    return f"""
    SELECT * EXCLUDE (rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_col}
        ORDER BY {h} NULLS LAST, {key} NULLS LAST) AS rn
      FROM {table}
    ) WHERE rn <= {n_per_group}
    """


def split_train_eval(
    df: DataFrame, key: str, eval_pct: float, seed: str = "split"
) -> DataFrame:
    """Disjoint, exhaustive, deterministic train/eval assignment — the
    leakage-safe split: a document's side is a pure function of its
    key, so a re-crawled or re-deduped copy of the same document can
    never migrate across the split between runs."""
    bps = int(round(eval_pct * 100))
    h = P.hash60_spark(f"cast({key} as string)", seed)
    return df.withColumn(
        "split",
        F.when(F.expr(f"pmod({h}, 10000) < {bps}"), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def split_train_eval_sql(
    table: str, key: str, eval_pct: float, seed: str = "split"
) -> str:
    bps = int(round(eval_pct * 100))
    h = P.hash60_duck(f"cast({key} as varchar)", seed)
    return (
        f"SELECT *, CASE WHEN ({h}) % 10000 < {bps} THEN 'eval' ELSE 'train' END"
        f" AS split FROM {table}"
    )
