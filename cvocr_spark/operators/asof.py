"""As-of join — the classic custom temporal operator Spark lacks as a
builtin, composed from existing DataFrame ops (the preferred strategy
per the task brief: composition before UDF).

Semantics: for every event, attach the most recent STRICTLY-EARLIER
'view' event of the same user (earlier by (ts, event_id) — total order,
so ties are deterministic).

Implementation is the scalable union+window trick, NOT a range join:
mark rows carry their own id in a nullable column; one window pass per
user with `last(mark, ignorenulls=True)` over ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING picks the as-of match.  Cost: ONE shuffle on
user_id and a per-group sort — no cross product, no range-join
explosion; this is the plan you want at 10^12 rows (an actual range
join would be O(n*m) per user).

Also here: the large-fact sort-merge join and the left-anti join (the
resume path's pending-minus-committed shape) for §2g join breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_marks(events: DataFrame, mark_type: str = "view") -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mark = F.when(
        F.col("event_type") == mark_type,
        F.struct(F.col("ts").alias("mts"), F.col("event_id").alias("mid")),
    )
    joined = events.withColumn("m", F.last(mark, ignorenulls=True).over(w))
    # NOTE: no unix_timestamp arithmetic here — it is session-timezone
    # dependent on NTZ values; the raw mark timestamp compares exactly
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("m.mid").alias("asof_mark_id"),
        F.col("m.mts").alias("asof_ts"),
    )


def asof_join_marks_sql(mark_type: str = "view") -> str:
    return f"""
    WITH marked AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = '{mark_type}'
                             THEN {{'mts': ts, 'mid': event_id}} END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
      FROM events
    )
    SELECT event_id, user_id, event_type,
           m.mid AS asof_mark_id,
           m.mts AS asof_ts
    FROM marked
    """


def big_join_smj(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Fact ⋈ fact with no broadcast hint: Catalyst picks the strategy
    from stats — broadcast at test scale (orders ~1 MB), sort-merge at
    production scale where both sides exceed the broadcast threshold.
    Shuffle lands on the join key only; aggs combine map-side."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


BIG_JOIN_SMJ_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def anti_join_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join: customers with no BIG order (>250k) — the exact
    shape of the resume path's pending-minus-committed bucket
    selection.  (Unrestricted, every customer has some order.)"""
    big = orders.filter(F.col("o_totalprice") > 250000.0)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_quiet"))
    )


ANTI_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_quiet
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
GROUP BY c_mktsegment
"""
