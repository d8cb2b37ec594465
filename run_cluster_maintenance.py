#!/usr/bin/env python
"""spark-submit entry point: streaming near-duplicate CLUSTER
MAINTENANCE (streaming/cluster_stream.py) — doc parquet files arriving
under an input directory flow through the incremental-dedup ->
incremental-CC composition, maintaining a durable clustering in
per-batch label generations.

    spark-submit --py-files cvocr_spark.zip run_cluster_maintenance.py \
        <input docs dir (parquet files of doc_id,text)> <state dir> \
        <checkpoint dir> [--threshold 0.8] [--continuous]

Default is a bounded availableNow drain (process everything present,
then exit — the cron/backfill shape); --continuous keeps the query
live for an always-on ingest.  Kill/replay-safe: the per-batch labels
_SUCCESS is the commit marker and replays are value-idempotent (see
cluster_stream.py; pinned in tests/test_streaming.py).

Prints the maintained clustering's keeper count on exit (bounded mode).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = list(sys.argv[1:])
    threshold = 0.8
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    continuous = "--continuous" in args
    if continuous:
        args.remove("--continuous")
    in_dir, state_dir, ckpt = args[0], args[1], args[2]

    from cvocr_spark.session import ensure_shipped
    from cvocr_spark.streaming import cluster_batch_writer, current_clusters

    spark = SparkSession.builder.appName("cvocr-cluster-maintenance").getOrCreate()
    ensure_shipped(spark)
    writer = cluster_batch_writer(spark, state_dir, threshold=threshold)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
    )
    if continuous:
        stream.start().awaitTermination()
        return
    stream.trigger(availableNow=True).start().awaitTermination()
    clusters = current_clusters(spark, state_dir)
    print(
        {
            "docs": clusters.count(),
            "keepers": clusters.filter("is_keeper").count(),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
