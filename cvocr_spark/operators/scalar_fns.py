"""Scalar function coverage (SURVEY §2c F5, §2g string/date/math +
array rows): the normalizer-function family of the reference
(reco.py:43-62, extract.py:15-26) exercised as native column
expressions, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_date_fns(events: DataFrame) -> DataFrame:
    """String + date/math functions over events: trim/substr/replace/
    case folding, date parts, rounding — one row per event (capped by
    event_id for test economy)."""
    return events.filter(F.col("event_id") < 2000).select(
        "event_id",
        F.upper("event_type").alias("et_upper"),
        F.substring("event_type", 1, 3).alias("et_pre"),
        F.regexp_replace("props", "[0-9]", "#").alias("props_masked"),
        F.length(F.trim("props")).alias("props_len"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        # tz-free second-of-day (unix_timestamp would depend on session tz)
        (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts"))
        .cast("bigint")
        .alias("sec_of_day"),
        F.round(F.sqrt(F.round(F.col("value") * 1000).cast("bigint")), 4).alias(
            "sqrt_milli"
        ),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("key"),
    )


STRING_DATE_FNS_SQL = """
SELECT event_id,
       upper(event_type) AS et_upper,
       substr(event_type, 1, 3) AS et_pre,
       regexp_replace(props, '[0-9]', '#', 'g') AS props_masked,
       cast(length(trim(props)) as int) AS props_len,
       cast(year(ts) as int) AS y,
       cast(month(ts) as int) AS m,
       cast(day(ts) as int) AS d,
       cast(hour(ts) as int) AS h,
       cast(hour(ts) * 3600 + minute(ts) * 60 + second(ts) as bigint) AS sec_of_day,
       round(sqrt(cast(round(value * 1000) as bigint)), 4) AS sqrt_milli,
       concat(event_type, ':', cast(user_id as varchar)) AS key
FROM events WHERE event_id < 2000
"""


def explode_array_ops(emb: DataFrame) -> DataFrame:
    """Array ops + posexplode (SURVEY §2g array row; the nested
    patches-vector analogue, cut.h:106): explode the embedding with
    position, aggregate back per vector."""
    exploded = emb.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return exploded.groupBy("vec_id").agg(
        F.count("*").alias("dim"),
        F.max(F.when(F.col("x") > 0, F.col("pos"))).alias("last_pos_positive"),
        F.round(F.sum(F.round(F.col("x") * 1000).cast("bigint")) / 1000.0, 3).alias(
            "sum_milli"
        ),
    )


EXPLODE_ARRAY_OPS_SQL = """
WITH raw AS (
  SELECT vec_id,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> {'pos': i - 1, 'x': cast(embedding[i] as double)})) AS u
  FROM embeddings WHERE vec_id < 50
), e AS (
  SELECT vec_id, cast(u.pos as int) AS pos, u.x AS x FROM raw
)
SELECT vec_id, count(*) AS dim,
       max(CASE WHEN x > 0 THEN pos END) AS last_pos_positive,
       round(cast(sum(cast(round(x * 1000) as bigint)) as bigint) / 1000.0, 3) AS sum_milli
FROM e GROUP BY vec_id
"""


def json_map_ops(events: DataFrame) -> DataFrame:
    """JSON + map-type coverage (SURVEY §2g array/map/json row): parse
    the props JSON column with an explicit schema (never inferred),
    round-trip a value through a MapType column, aggregate."""
    k = F.from_json("props", "k bigint")["k"]
    m = F.create_map(F.lit("k"), k, F.lit("k2"), k * 2)
    parsed = events.select(
        "event_type",
        k.alias("k"),
        F.element_at(m, "k2").alias("k2"),  # map round-trip
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum("k2").alias("sum_k2"),
    )


JSON_MAP_OPS_SQL = """
WITH parsed AS (
  SELECT event_type,
         cast(json_extract(props, '$.k') as bigint) AS k,
         MAP(['k', 'k2'], [cast(json_extract(props, '$.k') as bigint),
                           cast(json_extract(props, '$.k') as bigint) * 2])['k2'][1] AS k2
  FROM events
)
SELECT event_type, count(*) AS n,
       cast(sum(k) as bigint) AS sum_k, max(k) AS max_k,
       cast(sum(k2) as bigint) AS sum_k2
FROM parsed GROUP BY event_type
"""


def cube_counts(docs: DataFrame) -> DataFrame:
    """CUBE grouping sets (SURVEY §2g grouping-sets row)."""
    return docs.cube("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


CUBE_COUNTS_SQL = """
SELECT lang, source, count(*) AS n, cast(sum(n_chars) as bigint) AS chars
FROM documents GROUP BY CUBE (lang, source)
"""


def extract_match_rate(extracted_norm: DataFrame, docs_with_url: DataFrame) -> DataFrame:
    """C5 golden-comparison join (SURVEY §2f): extracted ⋈ golden on
    url, match-rate aggregation — the explicit validation query the
    reference left to eyeballing results.txt."""
    j = extracted_norm.join(docs_with_url, "url", "full_outer")
    return j.agg(
        F.count("*").alias("n_urls"),
        F.sum(
            F.when(F.col("got") == F.col("want"), 1).otherwise(0)
        ).alias("n_matched"),
        F.round(
            F.sum(F.when(F.col("got") == F.col("want"), 1).otherwise(0))
            / F.count("*")
            * 100.0,
            4,
        ).alias("match_pct"),
    )
