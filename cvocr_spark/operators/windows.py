"""Window / order-dependent operators (SURVEY §2e) as native Spark ops.

These are the relational re-expressions of the reference's
order-dependent passes: reading-order assignment (preprocess.h:452-487),
neighbor reclassification (cut.h:733-769), run-length grouping
(cut.h:812-859), per-patch top-k (reco.py:64-79), and ordered assembly
(reco.py:246-265).  Every window is fully tie-broken so results are
deterministic under any partitioning (the driver hashes values).

Scale notes: each window shuffles once on its partition key; keys here
(user_id, l_returnflag, lang) are the natural aggregation keys, and
AQE's skew handling covers hot keys.  None of these operators collect
to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gaps_islands(events: DataFrame, min_run: int = 3) -> DataFrame:
    """W3 gaps-and-islands: runs of >= min_run consecutive equal
    event_type per user (ordered by ts, event_id) — the graft of the
    >=3-consecutive-NOTYPE rule (cut.h:818-840)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_island",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w))
    return (
        flagged.groupBy("user_id", "island", "event_type")
        .agg(F.count("*").alias("n_run"), F.min("event_id").alias("first_event"))
        .filter(F.col("n_run") >= min_run)
        .select("user_id", "event_type", "n_run", "first_event")
    )


def gaps_islands_sql(min_run: int = 3) -> str:
    return f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS new_island
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_id, event_type,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS island
      FROM flagged
    )
    SELECT user_id, event_type, count(*) AS n_run, min(event_id) AS first_event
    FROM islands GROUP BY user_id, island, event_type
    HAVING count(*) >= {min_run}
    """


def neighbor_relabel(events: DataFrame) -> DataFrame:
    """W2 neighbor-context reclassification (cut.h:733-769): an event
    whose previous and next neighbor agree on a different type takes the
    neighbors' type; returns counts per final type."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagc, leadc = F.lag("event_type").over(w), F.lead("event_type").over(w)
    relabeled = events.withColumn(
        "final_type",
        F.when(
            (lagc == leadc) & (F.col("event_type") != lagc), lagc
        ).otherwise(F.col("event_type")),
    )
    return relabeled.groupBy("final_type").agg(F.count("*").alias("n"))


NEIGHBOR_RELABEL_SQL = """
WITH x AS (
  SELECT CASE WHEN lag(event_type) OVER w = lead(event_type) OVER w
                   AND event_type <> lag(event_type) OVER w
              THEN lag(event_type) OVER w ELSE event_type END AS final_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT final_type, count(*) AS n FROM x GROUP BY final_type
"""


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """P10-analogue sessionization: a new session starts when the gap to
    the previous event exceeds gap_s (the graft of fusion's
    gap >= MIN_MARGIN refusal, cut.h:458)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap test via interval comparison: unix_timestamp
    # truncates to whole seconds (and DuckDB's epoch() does not), so a
    # seconds-diff comparison disagrees across engines for gaps whose
    # fractional part straddles the threshold
    gap = F.expr(f"INTERVAL {gap_s} SECONDS")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > gap),
            1,
        ).otherwise(0),
    ).withColumn("sess", F.sum("new_sess").over(w))
    per_sess = flagged.groupBy("user_id", "sess").agg(F.count("*").alias("len"))
    return per_sess.groupBy("user_id").agg(
        F.max("sess").alias("n_sessions"),
        F.max("len").alias("max_len"),
        F.sum("len").alias("n_events"),
    )


def sessionize_sql(gap_s: int = 1800) -> str:
    return f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {gap_s} SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
      FROM flagged
    ), per_sess AS (
      SELECT user_id, sess, count(*) AS len FROM sess GROUP BY user_id, sess
    )
    SELECT user_id, cast(max(sess) as bigint) AS n_sessions,
           max(len) AS max_len, cast(sum(len) as bigint) AS n_events
    FROM per_sess GROUP BY user_id
    """


def topk_per_group(lineitem: DataFrame, k: int = 3) -> DataFrame:
    """W6 per-group top-k (reco.py:64-79 top-candidates analogue), fully
    tie-broken for determinism."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


def topk_per_group_sql(k: int = 3) -> str:
    return f"""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, cast(rn as int) AS rn
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= {k}
    """


def tumbling_window_agg(events: DataFrame, minutes: int = 15) -> DataFrame:
    """Time-bucketed aggregation (the streaming windowed-agg shape, run
    on a batch frame): 15-minute tumbling windows per event_type."""
    w = F.window("ts", f"{minutes} minutes")  # epoch-aligned tumbling
    return events.groupBy(w.alias("w"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_milli"),
    ).select(
        F.col("w.start").alias("win_start"),
        "event_type",
        "n",
        "sum_milli",
    )


def tumbling_window_agg_sql(minutes: int = 15) -> str:
    # explicit 1970 origin: DuckDB's time_bucket defaults to a 2000-01-01
    # origin, which only coincides with Spark's epoch-aligned windows for
    # day-dividing widths (15 min passes, 7 min silently would not)
    return f"""
    SELECT time_bucket(INTERVAL '{minutes} minutes', ts,
                       TIMESTAMP '1970-01-01') AS win_start,
           event_type, count(*) AS n,
           cast(sum(cast(round(value * 1000) as bigint)) as bigint) AS sum_milli
    FROM events GROUP BY 1, 2
    """


def ordered_assembly(docs: DataFrame, prefix_len: int = 30) -> DataFrame:
    """W7 ordered text assembly (reco.py:246-265) as a relational op:
    per-lang doc_id-ordered concat.  collect_list alone is
    order-nondeterministic post-shuffle (SURVEY §7 'ordering' risk), so
    order is imposed by array_sort on (doc_id, prefix) structs — stable
    under any partitioning."""
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("doc_id"),
                            F.substring("text", 1, prefix_len).alias("prefix"),
                        )
                    )
                ),
                lambda x: x["prefix"],
            ),
            "|",
        ).alias("assembled"),
    )


def ordered_assembly_sql(prefix_len: int = 30) -> str:
    return f"""
    SELECT lang, count(*) AS n_docs,
           string_agg(substr(text, 1, {prefix_len}), '|' ORDER BY doc_id) AS assembled
    FROM documents GROUP BY lang
    """
