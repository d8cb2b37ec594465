"""Structured Streaming extraction (SURVEY §2g streaming row): new page
files flow through the SAME kernel into an append sink; output equals
the batch path exactly."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.fixtures import gen_pages_df  # noqa: E402
from cvocr_spark.plans.job import extract_pages  # noqa: E402
from cvocr_spark.streaming import extract_pages_stream  # noqa: E402


def test_stateful_dedup_across_microbatches(spark):
    import pyspark.sql.functions as F

    from cvocr_spark.streaming import dedup_urls_stream

    d = tempfile.mkdtemp(prefix="cvocr_dedup_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = gen_pages_df(spark, docs).select("url", "warc_ts", "html").cache()
        n = pages.count()
        in_dir, out_dir, ckpt = d + "/in", d + "/out", d + "/ckpt"
        # drop 1: first 300 urls; drop 2: ALL urls (300 dups + 200 new)
        pages.limit(300).write.mode("overwrite").parquet(in_dir)
        pages.write.mode("append").parquet(in_dir)
        # + a NULL-url row: must be dropped natively, not crash a shard
        # (xxhash64(NULL) = seed, so it WOULD reach the state fn and
        # TypeError in sorted(seen) without the operator's filter)
        spark.createDataFrame(
            [(None, None, None)], "url string, warc_ts timestamp, html binary"
        ).write.mode("append").parquet(in_dir)

        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, html binary"
        ).option("maxFilesPerTrigger", 4).parquet(in_dir)
        q = (
            # bounded backfill mode (state_ttl_ms=None): an availableNow
            # query under ProcessingTimeTimeout never self-terminates
            # (timer batches keep it alive) — see dedup_urls_stream
            dedup_urls_stream(stream, state_ttl_ms=None)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = spark.read.parquet(out_dir)
        # every url exactly once despite duplicate drops
        assert out.count() == n
        assert out.select("url").distinct().count() == n
        assert out.groupBy("url").count().filter(F.col("count") > 1).count() == 0
        pages.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_dedup_ttl_mode_runs_live(spark):
    """The production TTL configuration (ProcessingTimeTimeout): drive a
    continuously-triggered query, confirm dedup output, then stop it
    explicitly (it will not self-terminate — that's the documented
    contract of timer-based state)."""
    import time

    import pyspark.sql.functions as F  # noqa: F401

    from cvocr_spark.streaming import dedup_urls_stream

    d = tempfile.mkdtemp(prefix="cvocr_ttl_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = gen_pages_df(spark, docs).select("url", "warc_ts", "html").limit(60)
        in_dir, out_dir, ckpt = d + "/in", d + "/out", d + "/ckpt"
        pages.write.mode("overwrite").parquet(in_dir)
        pages.write.mode("append").parquet(in_dir)  # every url twice

        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, html binary"
        ).parquet(in_dir)
        q = (
            dedup_urls_stream(stream, state_ttl_ms=60_000)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 120
            n = -1
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out_dir).select("url").distinct().count()
                    if n >= 60 and spark.read.parquet(out_dir).count() == n:
                        break
                except Exception:
                    pass
                time.sleep(2)
            out = spark.read.parquet(out_dir)
            assert out.count() == 60 and out.select("url").distinct().count() == 60
            assert q.isActive  # timer batches keep the TTL query alive
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_watermarked_window_counts(spark):
    from cvocr_spark.streaming import extract_pages_stream, windowed_counts_stream

    d = tempfile.mkdtemp(prefix="cvocr_wm_")
    try:
        import pyspark.sql.functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        # spread warc_ts across 10 hours so the 2h watermark CLOSES most
        # 1h windows (append mode only emits closed windows)
        pages = gen_pages_df(spark, docs).withColumn(
            "warc_ts",
            F.col("warc_ts")
            + F.expr("make_interval(0, 0, 0, 0, cast(pmod(xxhash64(url), 10) as int), 0, 0)"),
        )
        in_dir, ckpt = d + "/in", d + "/ckpt"
        pages.repartition(10).write.mode("overwrite").parquet(in_dir)

        agg = windowed_counts_stream(extract_pages_stream(spark, in_dir))
        q = (
            agg.writeStream.format("memory")
            .queryName("wm_counts")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["win_start"]: (r["n_docs"], r["n_chars"])
            for r in spark.sql("select * from wm_counts").collect()
        }
        # batch reference: same windows over the batch-extracted frame
        ref = {
            r["win_start"]: (r["n_docs"], r["n_chars"])
            for r in extract_pages(spark.read.parquet(in_dir), salted=False)
            .groupBy(F.window("warc_ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n_docs"), F.sum(F.length("text")).alias("n_chars"))
            .select(F.col("w.start").alias("win_start"), "n_docs", "n_chars")
            .collect()
        }
        # append-mode emits only watermark-closed windows: every emitted
        # window must match the batch reference, and most windows close
        # (warc_ts spans ~500s per FIXTURES, all within a couple windows)
        assert got, "no windows emitted"
        for k, v in got.items():
            assert ref[k] == v
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_kill_resume_with_lineage(spark):
    """Streaming mirror of test_resume_after_partial_run (VERDICT r2
    item 8): run the lineage stream over a partial input drop, 'kill'
    it (query ends: availableNow), drop more files, resume on the SAME
    checkpoint — the resumed run must process ONLY the new files, the
    combined output must equal the batch path byte-for-byte, and every
    (batch_id) manifest group must be unique (nothing reprocessed).
    A replayed microbatch (same batch_id re-delivered after a crash
    between sink write and checkpoint commit) must be a no-op."""
    import pyspark.sql.functions as F

    from cvocr_spark.streaming import run_stream_with_lineage

    d = tempfile.mkdtemp(prefix="cvocr_sresume_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = gen_pages_df(spark, docs).cache()
        n = pages.count()
        in_dir, out_dir, ckpt = d + "/in", d + "/out", d + "/ckpt"
        mani_dir = out_dir + "_manifest"

        # drop 1: half the corpus; run to completion and stop (the
        # deterministic stand-in for a kill: the checkpoint is exactly
        # a mid-ingest state when drop 2 lands later)
        pages.filter("length(url) % 2 = 0").write.mode("overwrite").parquet(in_dir)
        q1 = run_stream_with_lineage(spark, in_dir, out_dir, ckpt, mani_dir)
        q1.awaitTermination(120)
        n1 = spark.read.parquet(out_dir).count()
        mani1 = spark.read.parquet(mani_dir)
        batches1 = {r["batch_id"] for r in mani1.select("batch_id").distinct().collect()}
        assert 0 < n1 < n

        # drop 2: the rest; resume on the same checkpoint
        pages.filter("length(url) % 2 = 1").write.mode("append").parquet(in_dir)
        q2 = run_stream_with_lineage(spark, in_dir, out_dir, ckpt, mani_dir)
        q2.awaitTermination(120)

        out = spark.read.parquet(out_dir)
        assert out.count() == n
        assert out.select("url").distinct().count() == n  # nothing reprocessed
        mani2 = spark.read.parquet(mani_dir)
        batches2 = {r["batch_id"] for r in mani2.select("batch_id").distinct().collect()}
        assert batches1 < batches2  # resume added NEW batch ids only
        # manifest n_docs audits the sink exactly, per lineage bucket
        sums = {
            r["bucket"]: r["total"]
            for r in mani2.groupBy("bucket").agg(F.sum("n_docs").alias("total")).collect()
        }
        got = {
            r["bucket"]: r["cnt"]
            for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
        }
        assert sums == got

        # resumed result == batch result, byte-for-byte
        batch = extract_pages(spark.read.parquet(in_dir), salted=False).select(
            "url", "text"
        )
        streamed = out.select("url", "text")
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0

        # idempotence under microbatch REPLAY (crash between sink write
        # and checkpoint commit re-delivers the same batch_id): feeding
        # an already-committed batch_id through the writer is a no-op
        from cvocr_spark.streaming.extract_stream import lineage_batch_writer

        writer = lineage_batch_writer(spark, out_dir, mani_dir)
        replay_df = extract_pages(
            spark.read.parquet(in_dir).limit(5), salted=False
        )
        writer(replay_df, min(batches2))  # replay: must be skipped
        assert spark.read.parquet(out_dir).count() == n
        assert spark.read.parquet(mani_dir).count() == mani2.count()
        pages.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark):
    d = tempfile.mkdtemp(prefix="cvocr_stream_")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pages = gen_pages_df(spark, docs).cache()
        in_dir, out_dir, ckpt = d + "/in", d + "/out", d + "/ckpt"
        # two separate file drops (two micro-batch triggers minimum)
        pages.filter("length(url) % 2 = 0").write.mode("overwrite").parquet(in_dir)
        pages.filter("length(url) % 2 = 1").write.mode("append").parquet(in_dir)

        q = (
            extract_pages_stream(spark, in_dir, max_files_per_trigger=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        streamed = spark.read.parquet(out_dir).select("url", "text")
        batch = extract_pages(spark.read.parquet(in_dir), salted=False).select(
            "url", "text"
        )
        assert streamed.count() == pages.count()
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0
        pages.unpersist()
    finally:
        shutil.rmtree(d, ignore_errors=True)

def test_lineage_replay_inside_commit_window(spark, tmp_path):
    """ADVICE r3 (medium): a crash AFTER the output write but BEFORE
    the manifest append used to leave rows the manifest guard couldn't
    see — the replayed microbatch appended them AGAIN.  The sink now
    partitions by batch_id with dynamic partition overwrite, so the
    replay rewrites its own partition: same row count, manifest audits
    the sink exactly.  Also pins the no-full-output-rescan property
    (VERDICT r3 #6): the manifest derives from the in-memory frame."""
    import inspect

    import pyspark.sql.functions as F

    from cvocr_spark.streaming import extract_stream
    from cvocr_spark.streaming.extract_stream import lineage_batch_writer

    out_dir = str(tmp_path / "out")
    mani_dir = str(tmp_path / "mani")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    ext = extract_pages(gen_pages_df(spark, docs), salted=False)

    writer = lineage_batch_writer(spark, out_dir, mani_dir)
    writer(ext, 1)
    n = spark.read.parquet(out_dir).count()
    assert n > 0

    # crash window: output landed, manifest row lost
    shutil.rmtree(mani_dir)
    # restart (fresh writer => fresh committed-id cache) re-delivers
    # batch 1: the partition is REWRITTEN, not appended
    writer2 = lineage_batch_writer(spark, out_dir, mani_dir)
    writer2(ext, 1)
    out = spark.read.parquet(out_dir)
    assert out.count() == n, "replay inside the commit window duplicated rows"
    mani = spark.read.parquet(mani_dir)
    assert mani.agg(F.sum("n_docs")).collect()[0][0] == n

    # and a SECOND replay through the SAME writer is a cached no-op
    writer2(ext, 1)
    assert spark.read.parquet(out_dir).count() == n
    assert spark.read.parquet(mani_dir).count() == mani.count()

    # regression pin: the manifest must never re-read the output dir
    src = inspect.getsource(extract_stream.lineage_batch_writer)
    assert "read.parquet(output_dir)" not in src

def test_stream_stats_partials_merge_to_batch_histogram(spark, tmp_path):
    """Mergeable sketch partials in streaming: two input drops flow
    through the stats sink (one log2-histogram partial per microbatch);
    the merged view must equal the histogram computed in ONE batch over
    the same rows — the partial/merge identity (histsketch) holding
    across microbatch boundaries, kill/resume included."""
    from cvocr_spark.operators.histsketch import log2_histogram
    from cvocr_spark.plans.job import extract_pages
    from cvocr_spark.streaming import read_merged_stats, run_stream_with_stats

    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = gen_pages_df(spark, docs).cache()
    in_dir = str(tmp_path / "in")
    stats_dir = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")

    pages.filter("length(url) % 2 = 0").write.mode("overwrite").parquet(in_dir)
    run_stream_with_stats(spark, in_dir, stats_dir, ckpt).awaitTermination(120)
    # resume with the rest (the stream was 'killed' between drops)
    pages.filter("length(url) % 2 = 1").write.mode("append").parquet(in_dir)
    run_stream_with_stats(spark, in_dir, stats_dir, ckpt).awaitTermination(120)

    merged = {
        (r["grp"], r["bucket"]): r["n"]
        for r in read_merged_stats(spark, stats_dir).collect()
    }
    batch = extract_pages(spark.read.parquet(in_dir), salted=False)
    want = {
        (r["grp"], r["bucket"]): r["n"]
        for r in log2_histogram(
            batch.select(F.col("flags").alias("g"), F.length("text").alias("v")),
            "g",
            "v",
        ).collect()
    }
    assert merged == want and len(merged) > 0
    pages.unpersist()


def test_streaming_cluster_maintenance_matches_batch(spark, tmp_path):
    """r5 streaming cluster maintenance: doc batches arrive as a file
    stream (1 file per microbatch); the maintained clustering after the
    last batch must equal a from-scratch CC over every pair the stream
    discovered — the soak-proven composition, driven by the real
    Structured Streaming engine; then the torn-commit replay (labels
    _SUCCESS gone) must be value-idempotent."""
    import time as _time

    import pyspark.sql.functions as F  # noqa: F401

    from cvocr_spark.operators import dedup as dd
    from cvocr_spark.streaming import cluster_batch_writer, current_clusters
    from cvocr_spark.streaming.cluster_stream import _complete_label_gens

    base_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    base_b = ("metric spaces admit open covers whose nerve complexes capture "
              "homotopy type under mild convexity assumptions everywhere")
    batches = [
        [(1, f"{base_a} alpha one"), (2, f"{base_a} alpha two"),
         (50, "totally unrelated document about differential geometry today")],
        [(3, f"{base_a} alpha three"), (10, f"{base_b} beta one")],
        [(4, f"{base_a} alpha one"), (11, f"{base_b} beta two")],
    ]
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{in_dir}/b{i}")
        _time.sleep(0.05)  # distinct mtimes: file-source order = drop order

    writer = cluster_batch_writer(spark, state)
    (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/b*")
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )

    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in current_clusters(spark, state).collect()
    }
    # batch equivalent over the same arrival order
    all_docs = [r for rows in batches for r in rows]
    corpus = spark.createDataFrame(all_docs, "doc_id bigint, text string")
    pairs = None
    existing = None
    for rows in batches:
        bdf = spark.createDataFrame(rows, "doc_id bigint, text string")
        intra = dd.minhash_verified_dups(bdf, threshold=0.8).select("a", "b")
        newp = intra if existing is None else intra.unionByName(
            dd.dedup_incremental_pairs(bdf, existing, threshold=0.8)
        )
        pairs = newp if pairs is None else pairs.unionByName(newp)
        existing = bdf if existing is None else existing.unionByName(bdf)
    want = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in dd.dedup_clusters(corpus, pairs).collect()
    }
    assert got == want
    # the cross-batch family collapsed to one keeper; exact copy dropped
    assert got[4] == (1, False) and got[1] == (1, True)
    assert got[10][1] and not got[11][1]

    # torn-commit replay: the engine re-delivers a batch whose labels
    # commit vanished; recomputing from the previous generation must
    # reach the same clustering (value-idempotent at-least-once)
    gens = _complete_label_gens(spark, f"{state}/labels")
    last = gens[-1]
    os.remove(f"{state}/labels/gen_{last}/_SUCCESS")
    writer(
        spark.createDataFrame(batches[last], "doc_id bigint, text string"),
        last,
    )
    again = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in current_clusters(spark, state).collect()
    }
    assert again == got


def test_cluster_maintenance_probe_skips_signature_recompute(spark, tmp_path):
    """r6 (VERDICT r5 next #1 'done' pin): the cross-batch pair stage
    served from the stored band table must not re-derive ANY minhash
    signature — the md5-per-shingle pipeline may appear only in the
    band WRITE for the new batch, never in the probe plan.  The former
    in-plan form is the contrast: banding the existing side put md5
    back into every batch's plan."""
    import pyspark.sql.functions as F

    from cvocr_spark.operators import dedup as dd
    from cvocr_spark.streaming import cluster_batch_writer

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "metric spaces admit open covers whose nerve complexes")],
        "doc_id bigint, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog today indeed")],
        "doc_id bigint, text string",
    )
    writer = cluster_batch_writer(spark, state)
    writer(b0, 0)
    writer(b1, 1)

    # rebuild batch 1's cross-pair frame exactly as the writer does
    all_bands = spark.read.parquet(f"{state}/bands")
    nb = all_bands.filter(F.col("batch_id") == 1).select(
        "doc_id", "band_id", "band_val"
    )
    sb = all_bands.filter(F.col("batch_id") < 1).select(
        "doc_id", "band_id", "band_val"
    )
    existing = (
        spark.read.parquet(f"{state}/corpus")
        .filter(F.col("batch_id") < 1)
        .select("doc_id", "text")
    )
    served = dd.dedup_incremental_pairs(
        b1, existing, new_bands=nb, existing_bands=sb
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "md5(" not in plan, plan[:3000]
    # contrast: the in-plan form re-bands (and so re-hashes) per batch
    inplan = dd.dedup_incremental_pairs(b1, existing)
    assert "md5(" in inplan._jdf.queryExecution().executedPlan().toString()
    # and the served pairs are identical to the in-plan pairs
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inplan.collect())
    )


def test_cluster_maintenance_gen_retention(spark, tmp_path):
    """r6 (VERDICT r5 next #2): keep_gens bounds label-generation state
    — older committed gen_* dirs are deleted after each new commit,
    current_clusters still serves the newest generation, and a replay
    of the retained window stays value-idempotent."""
    import os as _os

    from cvocr_spark.streaming import cluster_batch_writer, current_clusters
    from cvocr_spark.streaming.cluster_stream import _complete_label_gens

    state = str(tmp_path / "state")
    base = "the quick brown fox jumps over the lazy dog near the river"
    batches = [
        [(1, f"{base} alpha one"), (2, f"{base} alpha two")],
        [(3, f"{base} alpha three")],
        [(4, f"{base} alpha one")],
    ]
    writer = cluster_batch_writer(spark, state, keep_gens=1)
    for i, rows in enumerate(batches):
        writer(
            spark.createDataFrame(rows, "doc_id bigint, text string"), i
        )
    assert _complete_label_gens(spark, f"{state}/labels") == [2]
    assert not _os.path.exists(f"{state}/labels/gen_0")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in current_clusters(spark, state).collect()
    }
    assert got[1] == (1, True) and got[4] == (1, False)
    # replay of the newest (retained) generation: torn commit, redeliver
    _os.remove(f"{state}/labels/gen_2/_SUCCESS")
    writer(
        spark.createDataFrame(batches[2], "doc_id bigint, text string"), 2
    )
    again = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in current_clusters(spark, state).collect()
    }
    assert again == got
