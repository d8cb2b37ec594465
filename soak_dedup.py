#!/usr/bin/env python
"""Dedup-pipeline soak: 200k near-duplicate documents end to end with
the PRODUCTION configuration — k=128 minhash, 16 bands x 8 rows
(S-curve threshold ~J=0.9), exact Jaccard verification, connected
components, one keeper per cluster.

Corpus: sf0.1 documents (5k) x VARIANTS copies; variant v of doc d gets
doc_id d + v*1e6 and one extra token — each family is a near-dup clique.
NOTE the synthetic corpus is itself template-heavy (measured cross-doc
token Jaccard: median 0.62, p95 0.90, max 1.0), so cross-family merges
at high verified Jaccard are CORRECT detections, not errors — which is
exactly why the pipeline clusters only VERIFIED pairs.

Reported metrics:
  * recall — of sampled within-family pairs whose TRUE token Jaccard
    >= the verify threshold, the fraction the LSH->verify pipeline
    emitted (banding misses and hot-bucket drops both show here).
  * precision — 1.0 by construction (every emitted pair carries its
    exact Jaccard and passed the threshold).
  * throughput + keeper counts for the 200k corpus.

Measured (local[32], 200k docs) — the hot-bucket cap is the
recall-vs-cost knob, and this run pins both operating points:
  max_bucket=100:  recall 0.917, 4.9M candidates, 110 s end-to-end
                   (misses = pairs living ONLY in buckets of >100
                   near-identical docs — the degenerate mass the guard
                   exists to skip)
  max_bucket=2000: recall 0.988, 29.2M candidates, 212 s
                   (remaining misses = groups >2000 exact-ish copies)

Run manually: python soak_dedup.py  (~2-4 min at local[32]).
The k=8/4x2 demo config run is in git history (round-2 log): it emitted
4.6M raw candidates with heavy false-candidate admixture — the
motivating contrast for the wide config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
VARIANTS = int(os.environ.get("CVOCR_SOAK_VARIANTS", "40"))
MAX_BUCKET = int(os.environ.get("CVOCR_SOAK_MAX_BUCKET", "2000"))
FAMILY = 1_000_000
THRESHOLD = 0.9


def main() -> None:
    from pyspark.sql import functions as F

    from cvocr_spark.operators import dedup
    from cvocr_spark.session import build_session

    spark = build_session(
        app="cvocr-dedup-soak", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_families = base.count()
    variants = spark.range(VARIANTS).select(F.col("id").alias("v"))
    corpus = (
        base.crossJoin(variants)
        .select(
            (F.col("doc_id") + F.col("v") * FAMILY).alias("doc_id"),
            F.concat("text", F.lit(" variantmark"), F.col("v").cast("string")).alias("text"),
        )
        .repartition(CPUS * 2)
        .persist()
    )
    n_docs = corpus.count()

    t0 = time.perf_counter()
    cand = dedup.minhash_lsh_pairs_wide(corpus, max_bucket=MAX_BUCKET).persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0

    t1 = time.perf_counter()
    verified = dedup.verify_pairs_jaccard(cand, corpus, threshold=THRESHOLD).persist()
    n_verified = verified.count()
    t_verify = time.perf_counter() - t1

    t2 = time.perf_counter()
    clusters = dedup.dedup_clusters(corpus, verified.select("a", "b")).persist()
    n_keepers = clusters.filter("is_keeper").count()
    t_clusters = time.perf_counter() - t2

    # CC kill/resume at soak scale (VERDICT r3 #9): reproduce the
    # on-disk state of a run SIGKILLED after its round-KILL_AT clamp
    # completed (max_iter cap leaves exactly the clamp frames a kill
    # leaves — parquet + _SUCCESS per 4th round), then resume from the
    # same checkpoint_dir with the same deterministic pair list and
    # demand keepers IDENTICAL to the uninterrupted run above.
    resume_demo = None
    if os.environ.get("CVOCR_SOAK_RESUME_DEMO", "1") != "0":
        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="cvocr_soak_cc_")
        kill_at = int(os.environ.get("CVOCR_SOAK_KILL_AT_ROUND", "12"))
        pairs = verified.select("a", "b")
        t3 = time.perf_counter()
        _, rounds_killed = dedup._connected_components_rounds(
            pairs, max_iter=kill_at, checkpoint_dir=ckpt
        )
        t_killed = time.perf_counter() - t3
        t3 = time.perf_counter()
        resumed = dedup.dedup_clusters(corpus, pairs, checkpoint_dir=ckpt).persist()
        t_resumed = time.perf_counter() - t3
        diff = (
            clusters.filter("is_keeper").select("doc_id")
            .exceptAll(resumed.filter("is_keeper").select("doc_id")).count()
            + resumed.filter("is_keeper").select("doc_id")
            .exceptAll(clusters.filter("is_keeper").select("doc_id")).count()
        )
        resume_demo = {
            "kill_at_round": kill_at,
            "rounds_before_kill": rounds_killed,
            "killed_wall_sec": round(t_killed, 1),
            "resumed_wall_sec": round(t_resumed, 1),
            "keepers_match_scratch": diff == 0,
        }
        resumed.unpersist()
        shutil.rmtree(ckpt, ignore_errors=True)

    # recall ground truth: sample within-family variant pairs, compute
    # TRUE token jaccard; among those >= THRESHOLD, how many did the
    # pipeline emit?
    sample = (
        corpus.filter(F.col("doc_id") < FAMILY)  # variant 0 of each family
        .sample(0.1, seed=42)
        .select(F.col("doc_id").alias("fam_doc"))
        .limit(400)
    )
    truth_pairs = sample.select(
        F.col("fam_doc").alias("a"), (F.col("fam_doc") + FAMILY).alias("b")
    )  # (variant0, variant1) of sampled families
    toks = corpus.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    ta = toks.select(F.col("doc_id").alias("a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    truth = (
        truth_pairs.join(ta, "a").join(tb, "b")
        .withColumn(
            "true_j",
            inter.cast("double") / (F.size("toks_a") + F.size("toks_b") - inter),
        )
        .filter(F.col("true_j") >= THRESHOLD)
        .select("a", "b")
        .persist()
    )
    n_truth = truth.count()
    found = truth.join(verified, ["a", "b"], "left_semi").count()

    print(
        json.dumps(
            {
                "metric": "dedup_soak_k128",
                "docs": n_docs,
                "families": n_families,
                "variants": VARIANTS,
                "candidates": n_cand,
                "verified_pairs": n_verified,
                "verify_threshold": THRESHOLD,
                "max_bucket": MAX_BUCKET,
                "keepers": n_keepers,
                "recall_sampled_true_pairs": round(found / n_truth, 4) if n_truth else None,
                "recall_sample_size": n_truth,
                "cand_wall_sec": round(t_cand, 1),
                "verify_wall_sec": round(t_verify, 1),
                "clusters_wall_sec": round(t_clusters, 1),
                "docs_per_sec_end_to_end": round(
                    n_docs / (t_cand + t_verify + t_clusters), 1
                ),
                "resume_demo": resume_demo,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
