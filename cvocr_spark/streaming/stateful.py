"""Custom stateful streaming operators (applyInPandasWithState).

`dedup_urls_stream` is the streaming-ingest dedup a crawler pipeline
needs: across micro-batches, only the FIRST occurrence of each url
passes through; re-crawls and duplicate drops are filtered before the
(expensive) extraction kernel runs.  State = per-url-group set of seen
urls, keyed by a url-hash bucket so state shards evenly (the same
skew-defense as the batch path's salted bucketing).

Watermark-windowed aggregation (`windowed_counts_stream`) covers the
late-data path: counts per event-time tumbling window, state dropped
once the watermark passes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_OUT_DDL = "url string, warc_ts timestamp, html binary"
_STATE_SCHEMA = "seen array<string>"


DEDUP_STATE_TTL_MS = 6 * 3600 * 1000  # evict a shard's seen-set after 6h idle


def _make_dedup_group(ttl_ms: int | None):
    def _dedup_group(key, pdfs, state: GroupState):
        # TTL eviction (ADVICE r1): without it the seen-set grows
        # without bound on a long-running ingest.  A timed-out shard
        # clears its state — re-crawls older than the TTL pass through
        # again, the standard freshness/space trade of streaming dedup.
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"url": [], "warc_ts": [], "html": []})
            return
        seen = set(state.get[0]) if state.exists else set()
        n_before = len(seen)
        out = []
        for pdf in pdfs:
            # vectorized first-occurrence filter (guide §4.2): keep the
            # first row per url within the chunk, drop urls already in
            # state — same semantics as the former per-row Python loop
            # (which added to `seen` as it scanned), at pandas speed
            keep = pdf[~pdf.duplicated("url") & ~pdf["url"].isin(seen)]
            if len(keep):
                seen.update(keep["url"])
                out.append(keep[["url", "warc_ts", "html"]])
        if len(seen) > n_before:  # rewrite state only when it actually grew
            state.update((sorted(seen),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.concat(out)
        else:
            yield pd.DataFrame({"url": [], "warc_ts": [], "html": []})

    return _dedup_group


def dedup_urls_stream(
    pages_stream: DataFrame,
    n_shards: int = 32,
    state_ttl_ms: int | None = DEDUP_STATE_TTL_MS,
) -> DataFrame:
    """Streaming pages -> first-occurrence-only pages.

    At 10^12-doc scale the seen-set lives in a state store shard per
    url-hash bucket; this in-memory variant demonstrates the operator
    shape (a production variant would swap the set for a bloom filter
    checkpointed by the state store).

    State is bounded by a processing-time TTL (default 6h idle ->
    shard evicted).  CAVEAT, verified live: with ProcessingTimeTimeout
    the micro-batch engine keeps scheduling batches to service future
    timers, so an ``availableNow``/drain-and-stop run NEVER terminates
    on its own.  The TTL is for the always-on ingest deployment; pass
    ``state_ttl_ms=None`` for bounded backfill runs that must
    self-terminate (NoTimeout, state lives only for the run)."""
    # NULL url is not a valid page; drop it natively.  It would NOT
    # drop out on its own: xxhash64(NULL) returns the seed (not NULL),
    # so the row reaches a shard and sorted(seen) with a None among
    # strings TypeErrors, crashing that shard's state update.
    sharded = pages_stream.filter(F.col("url").isNotNull()).withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int")
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        sharded.groupBy("shard")
        .applyInPandasWithState(
            _make_dedup_group(state_ttl_ms),
            outputStructType=PAGES_OUT_DDL,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def windowed_counts_stream(
    extracted_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation over the
    extracted stream (late rows beyond the watermark are dropped and
    window state is reclaimed)."""
    return (
        extracted_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(F.col("w.start").alias("win_start"), "n_docs", "n_chars")
    )
