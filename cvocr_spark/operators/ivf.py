"""IVF (inverted-file) ANN — the coarse-quantizer scale path the task
brief names alongside LSH ("an IVF or LSH-bucketed variant").

The index is a k-means coarse quantizer trained with a FIXED number of
Lloyd iterations on integer-quantized vectors, which makes the whole
training run bit-reproducible in BOTH engines:

  * vectors quantize to milli-units (round(x*1000) as bigint) — exact;
  * init: the k vectors with smallest md5-hash of their id (seeded,
    order ties broken by vec_id) become centroids 0..k-1;
  * each iteration: assign every vector to the nearest centroid by
    integer squared-L2 (ties -> smallest centroid id), then recompute
    each centroid per-dimension as floor(sum/count + 0.5) — bigint sums
    are order-independent, the division is exact in doubles at this
    magnitude, and floor(x+0.5) rounds identically everywhere (no
    banker's rounding);
  * empty clusters keep their previous centroid.

Search: a query probes its ``n_probe`` nearest centroids and scores
ONLY vectors assigned to those lists with exact cosine — at 10^12 rows
the assignment column is the partition key (lists are written
clustered), so a query touches n_probe/k of the corpus.

Spark-side training collects k centroids (k x dim ints) to the driver
per iteration — bounded, like the LSH plane literals — and embeds them
as literals in the next assignment expression; the DuckDB oracle runs
the SAME fixed iterations as chained CTEs.  Identical results, very
different plans — which is the point of the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P

IVF_K = 8
IVF_ITERS = 2
N_PROBE = 2
DIM = 64


def _quant_expr(col: str = "embedding") -> str:
    return f"transform({col}, x -> cast(round(cast(x as double) * 1000) as bigint))"


def _dist_expr(em_col: str, centroid: list[int]) -> str:
    lit = "array(" + ", ".join(f"{v}L" for v in centroid) + ")"
    return (
        f"aggregate(zip_with({em_col}, {lit}, (x, y) -> (x - y) * (x - y)), "
        f"0L, (acc, v) -> acc + v)"
    )


def _train(emb: DataFrame, k: int, iters: int) -> tuple[list[list[int]], DataFrame]:
    """Returns (centroids, vecs) where vecs = (vec_id, embedding, em)."""
    vecs = emb.select(
        "vec_id", "embedding", F.expr(_quant_expr()).alias("em")
    ).persist()
    h = P.hash60_spark("cast(vec_id as string)", "ivf")
    seeds = (
        vecs.select("vec_id", "em", F.expr(h).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    centroids = [list(r["em"]) for r in seeds]
    for _ in range(iters):
        dists = F.array(*[F.expr(_dist_expr("em", c)) for c in centroids])
        assigned = vecs.select("vec_id", "em", dists.alias("ds")).select(
            "vec_id",
            "em",
            F.expr("cast(array_position(ds, array_min(ds)) - 1 as int)").alias("cid"),
        )
        stats = (
            assigned.select("cid", F.posexplode("em").alias("d", "v"))
            .groupBy("cid", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cid.setdefault(r["cid"], {})[r["d"]] = (r["s"], r["n"])
        new_centroids = []
        for cid in range(k):
            if cid in by_cid:
                dims = by_cid[cid]
                new_centroids.append(
                    [
                        math.floor(dims[d][0] / dims[d][1] + 0.5)
                        for d in range(len(centroids[cid]))
                    ]
                )
            else:  # empty cluster keeps its previous centroid
                new_centroids.append(centroids[cid])
        centroids = new_centroids
    return centroids, vecs


def ivf_ann_topk(
    emb: DataFrame,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    n_probe: int = N_PROBE,
    n_queries: int = 5,
    topk: int = 3,
) -> DataFrame:
    centroids, vecs = _train(emb, k, iters)
    dists = F.array(*[F.expr(_dist_expr("em", c)) for c in centroids])
    assigned = vecs.select("vec_id", "embedding", dists.alias("ds")).select(
        "vec_id",
        "embedding",
        F.expr("cast(array_position(ds, array_min(ds)) - 1 as int)").alias("cid"),
    )
    # query side: explode each query into its n_probe nearest lists
    qd = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        dists.alias("ds"),
    )
    probe = (
        qd.select(
            "query_id", "qe",
            F.posexplode("ds").alias("cid", "dist"),
        )
        .withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cid")
            ),
        )
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qe", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probe), "cid")
        .withColumn("sim", F.round(F.expr(P.cosine_spark("qe", "embedding")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sim")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= topk)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def ivf_ann_topk_sql(
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    n_probe: int = N_PROBE,
    n_queries: int = 5,
    topk: int = 3,
) -> str:
    """The same fixed-iteration training as chained CTEs, then the same
    probe/search — identical values from a completely different plan."""
    h = P.hash60_duck("cast(vec_id as varchar)", "ivf")
    ctes = [
        "vecs AS (SELECT vec_id, embedding, "
        "list_transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) AS em "
        "FROM embeddings)",
        f"""c0 AS (
      SELECT row_number() OVER (ORDER BY {h}, vec_id) - 1 AS cid, em AS cm
      FROM vecs ORDER BY {h}, vec_id LIMIT {k}
    )""",
    ]
    dist = (
        "list_sum(list_transform(range(1, {dim} + 1), "
        "i -> (v.em[i] - c.cm[i]) * (v.em[i] - c.cm[i])))".format(dim=DIM)
    )
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
      SELECT vec_id, em, cid FROM (
        SELECT v.vec_id, v.em, c.cid,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM vecs v CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{it} AS (
      SELECT p.cid,
             coalesce(n.cm, p.cm) AS cm
      FROM {prev} p LEFT JOIN (
        SELECT cid, list(mu ORDER BY d) AS cm FROM (
          SELECT cid, d, cast(floor(cast(sum(v) as double) / count(*) + 0.5) as bigint) AS mu
          FROM (SELECT cid, unnest(em) AS v, generate_subscripts(em, 1) AS d FROM a{it})
          GROUP BY cid, d
        ) GROUP BY cid
      ) n ON p.cid = n.cid
    )"""
        )
        prev = f"c{it}"
    final_c = prev
    cos = P.cosine_duck("p.qe", "a.embedding")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM vecs v CROSS JOIN {final_c} c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, qe, cid FROM (
        SELECT v.vec_id AS query_id, v.embedding AS qe, c.cid,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist}, c.cid) AS pr
        FROM vecs v CROSS JOIN {final_c} c
        WHERE v.vec_id < {n_queries}
      ) WHERE pr <= {n_probe}
    ),
    scored AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
             round({cos}, 6) AS sim
      FROM assigned a JOIN probe p USING (cid)
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             cast(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) as int) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, rn FROM ranked WHERE rn <= {topk}
    """
    )
