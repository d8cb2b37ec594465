"""Product quantization (PQ) ANN — the compression layer a
crawl-scale similarity index actually ships: each vector is stored as
M sub-codes (here 8 codes of 4 bits-worth each = 8 bytes instead of
256), and search scores candidates by Asymmetric Distance Computation
(ADC): the query precomputes one distance-lookup table per subspace
and a candidate's score is the SUM of M table lookups — no float math
per candidate at all.

Everything stays in the repo's exact-integer framework:

  * codebooks train per subspace with the SAME deterministic
    fixed-iteration Lloyd as the IVF coarse quantizer (ivf._train,
    generalized over dim) on milli-quantized subvectors — integer
    centroids, bit-reproducible;
  * encoding = per-subspace nearest-centroid assignment (the flat
    codegen form, ivf.assign_with_dists);
  * ADC tables are exact integer squared-L2 values computed on the
    driver from the collected query vectors (bounded: n_queries x M x
    K ints) and joined as a BROADCAST frame onto the exploded code
    table — flat HashAggregate SUM, no HOFs, no per-candidate Python;
  * the standard two-stage retrieval: ADC shortlist (cheap, code-only)
    -> exact integer-cosine RERANK of the shortlist (qcosine_expr, the
    same scoring the oracled numpy ANN uses).

The ADC score is EXACTLY the squared-L2 reconstruction distance
sum_m ||q_m - codebook[m][code_m]||^2 — asserted value-for-value
against a Python recomputation in tests/test_pq.py, along with
determinism and recall (recorded in tests/goldens/ann_recall.json).

Scale notes: the demo trains M codebooks as M sequential small jobs
(disclosed; a production build fuses them into one pass keyed by
(vec_id, sub)); search cost is O(corpus x M) exploded rows through one
broadcast join + sum — at 10^12 vectors this composes with the IVF
router (probe lists first, ADC within probed lists), which is the
standard IVF-PQ layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P
from . import ivf

PQ_M = 8  # subspaces
PQ_SUBDIM = ivf.DIM // PQ_M
PQ_K = 16  # codes per subspace
PQ_ITERS = 2
RERANK = 100  # ADC shortlist size fed to the exact rerank


def _sub_emb(emb: DataFrame, m: int) -> DataFrame:
    return emb.filter(F.size("embedding") == ivf.DIM).select(
        "vec_id",
        F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("embedding"),
    )


def train_codebooks(emb: DataFrame) -> list[list[list[int]]]:
    """[m][k][subdim] integer centroids, deterministic per subspace."""
    return [
        ivf._train(_sub_emb(emb, m), PQ_K, PQ_ITERS, dim=PQ_SUBDIM)
        for m in range(PQ_M)
    ]


def train_codebooks_fused(emb: DataFrame) -> list[list[list[int]]]:
    """The PRODUCTION training form: all M codebooks in ONE Spark job
    per Lloyd step, instead of M sequential per-subspace jobs (the
    reference form above — its wall at sf0.1 was ~20 s of fixed local
    job latency).  The exploded frame carries (vec_id, sub, dsub, v);
    assignment groups by (vec_id, sub) with K flat SUM aggregates
    whose centroid values come from ONE flat literal array indexed by
    sub*K*SUBDIM + j*SUBDIM + dsub; per-(sub, cid, dsub) means update
    all M books from one collect of M*K*SUBDIM bounded rows.

    Seeds are the same per-subspace rule (smallest md5 of vec_id —
    identical id set for every subspace), so the result is asserted
    LIST-IDENTICAL to train_codebooks in tests/test_pq.py."""
    import math

    ex = (
        ivf._quantized_exploded(emb)
        .withColumn("sub", (F.col("d") / PQ_SUBDIM).cast("int"))
        .withColumn("dsub", (F.col("d") % PQ_SUBDIM).cast("int"))
        .persist()
    )
    try:
        h = P.hash60_spark("cast(vec_id as string)", "ivf")
        seed_ids = [
            r["vec_id"]
            for r in emb.filter(F.size("embedding") == ivf.DIM)
            .select("vec_id", F.expr(h).alias("h"))
            .orderBy("h", "vec_id")
            .limit(PQ_K)
            .collect()
        ]
        seed_rows = ex.filter(F.col("vec_id").isin(seed_ids)).collect()
        by_vec: dict[tuple[int, int], dict[int, int]] = {}
        for r in seed_rows:
            by_vec.setdefault((r["vec_id"], r["sub"]), {})[r["dsub"]] = r["v"]
        # a corpus smaller than PQ_K (tiny shard, cold-start crawl)
        # yields fewer seeds — train with the effective K, exactly as
        # the per-subspace form does (limit(k) returns what exists)
        k_eff = len(seed_ids)
        books = [
            [
                [by_vec[(sid, m)][d] for d in range(PQ_SUBDIM)]
                for sid in seed_ids
            ]
            for m in range(PQ_M)
        ]
        for _ in range(PQ_ITERS):
            flat = [
                v for m in range(PQ_M) for j in range(k_eff) for v in books[m][j]
            ]
            lit = "array(" + ", ".join(f"{v}L" for v in flat) + ")"
            idx_base = F.col("sub") * (k_eff * PQ_SUBDIM) + F.col("dsub") + 1
            aggs = []
            for j in range(k_eff):
                diff = F.col("v") - F.element_at(
                    F.expr(lit), idx_base + j * PQ_SUBDIM
                )
                aggs.append(F.sum(diff * diff).alias(f"ds{j}"))
            dists = ex.groupBy("vec_id", "sub").agg(*aggs)
            cids = dists.select(
                "vec_id",
                "sub",
                F.expr(
                    "cast(array_position("
                    + "array("
                    + ", ".join(f"ds{j}" for j in range(k_eff))
                    + "), array_min(array("
                    + ", ".join(f"ds{j}" for j in range(k_eff))
                    + "))) - 1 as int)"
                ).alias("cid"),
            )
            stats = (
                ex.join(cids, ["vec_id", "sub"])
                .groupBy("sub", "cid", "dsub")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            by_key: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
            for r in stats:
                by_key.setdefault((r["sub"], r["cid"]), {})[r["dsub"]] = (
                    r["s"],
                    r["n"],
                )
            new_books = []
            for m in range(PQ_M):
                nb = []
                for j in range(k_eff):
                    dims = by_key.get((m, j))
                    if dims:
                        nb.append(
                            [
                                math.floor(dims[d][0] / dims[d][1] + 0.5)
                                for d in range(PQ_SUBDIM)
                            ]
                        )
                    else:  # empty cluster keeps its previous centroid
                        nb.append(books[m][j])
                new_books.append(nb)
            books = new_books
        return books
    finally:
        ex.unpersist()


def encode(emb: DataFrame, books: list[list[list[int]]]) -> DataFrame:
    """(vec_id, codes array<int> of length M): per-subspace nearest
    centroid, ties -> smallest code (the assign_with_dists tie-break)."""
    out = None
    for m, book in enumerate(books):
        cm = ivf.assign_with_dists(_sub_emb(emb, m), book, dim=PQ_SUBDIM).select(
            "vec_id", F.col("cid").alias(f"c{m}")
        )
        out = cm if out is None else out.join(cm, "vec_id")
    return out.select(
        "vec_id", F.array(*[F.col(f"c{m}") for m in range(PQ_M)]).alias("codes")
    )


def _adc_tables(emb: DataFrame, books, n_queries: int):
    """Driver-side exact integer LUTs: rows (query_id, sub, code, d).
    Bounded at n_queries x M x K."""
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .filter(F.size("embedding") == ivf.DIM)
        .select("vec_id", F.expr(P.quantize_spark("embedding")).alias("q"))
        .collect()
    )
    rows = []
    for r in qrows:
        q = r["q"]
        for m, book in enumerate(books):
            sub = q[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            for code, cent in enumerate(book):
                d = sum((a - b) * (a - b) for a, b in zip(sub, cent))
                rows.append((r["vec_id"], m, code, d))
    return rows


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    rerank: int | None = RERANK,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rn): ADC shortlist of ``rerank``
    candidates per query, exact integer-cosine rerank, top-k.  With
    ``rerank=None`` the raw ADC ranking is returned (sim = negative
    ADC distance — useful for the score-identity test)."""
    spark = emb.sparkSession
    books = train_codebooks_fused(emb)
    codes = encode(emb, books)
    lut = spark.createDataFrame(
        _adc_tables(emb, books, n_queries),
        "query_id bigint, sub int, code int, d bigint",
    )
    exploded = codes.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    adc = (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    if rerank is None:
        return (
            adc.withColumn("rn", F.row_number().over(w_adc).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", F.col("adc").alias("sim"), "rn")
        )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact rerank: integer-quantized cosine (the oracled numpy-ANN
    # scoring) over shortlist members only
    vq = emb.filter(F.size("embedding") == ivf.DIM).select(
        "vec_id", F.expr(P.quantize_spark("embedding")).alias("q")
    )
    nq = vq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("nv"),
        F.expr(
            "aggregate(q, 0L, (acc, x) -> acc + x * x)"
        ).alias("nn"),
    )
    qq = vq.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").alias("qn"),
    )
    dot = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    scored = (
        shortlist.join(nq, "neighbor_id")
        .join(F.broadcast(qq), "query_id")
        .withColumn("sim", F.round(F.expr(P.qcosine_expr(dot, "qn", "nn")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("sim"), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def ivfpq_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_probe: int = ivf.N_PROBE,
    rerank: int | None = RERANK,
) -> DataFrame:
    """The composed IVF-PQ layout — the standard crawl-scale index:
    the IVF coarse quantizer routes each query to its n_probe nearest
    lists, and ADC scores ONLY the codes living in probed lists (at
    10^12 rows: n_probe/k of the corpus through 8 table lookups each),
    then the exact rerank runs over the shortlist as in pq_adc_topk.

    Candidate restriction is a LEFT SEMI join of the code table
    against the probed (query_id, cid) pairs via each vector's own
    coarse assignment — broadcast (bounded by n_queries x n_probe
    routing rows joined through the corpus assignment), so the code
    table never shuffles.  Recall sits between raw ADC and full-corpus
    ADC+rerank at a fraction of the scored candidates
    (tests/test_pq.py records the measured point)."""
    spark = emb.sparkSession
    centroids = ivf._train(emb, ivf.IVF_K, ivf.IVF_ITERS)
    assigned = ivf.assign_with_dists(emb, centroids).select("vec_id", "ds", "cid")
    # per-query probe list from the query rows' own distance arrays
    probe = (
        assigned.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.posexplode("ds").alias("cid", "dist"))
        .withColumn(
            "pr",
            F.row_number().over(Window.partitionBy("query_id").orderBy("dist", "cid")),
        )
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "cid")
    )
    books = train_codebooks_fused(emb)
    codes = encode(emb, books).join(assigned.select("vec_id", "cid"), "vec_id")
    lut = spark.createDataFrame(
        _adc_tables(emb, books, n_queries),
        "query_id bigint, sub int, code int, d bigint",
    )
    # candidates: (query, vector) pairs whose list is probed BY that query
    cand = codes.join(F.broadcast(probe), "cid").select(
        "query_id", "vec_id", "codes"
    )
    adc = (
        cand.select("query_id", "vec_id", F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= (rerank or k))
        .select("query_id", "neighbor_id")
    )
    if rerank is None:
        return (
            adc.withColumn("rn", F.row_number().over(w_adc).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", F.col("adc").alias("sim"), "rn")
        )
    vq = emb.filter(F.size("embedding") == ivf.DIM).select(
        "vec_id", F.expr(P.quantize_spark("embedding")).alias("q")
    )
    nq = vq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("nv"),
        F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").alias("nn"),
    )
    qq = vq.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").alias("qn"),
    )
    dot = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    scored = (
        shortlist.join(nq, "neighbor_id")
        .join(F.broadcast(qq), "query_id")
        .withColumn("sim", F.round(F.expr(P.qcosine_expr(dot, "qn", "nn")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc_nulls_last("sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )
