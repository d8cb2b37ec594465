"""Vectorized ANN: numpy-matmul brute-force cosine top-k inside
mapInPandas — the throughput path for similarity search at scale.

cosine_topk (similarity.py) is the exactness baseline: pure column
expressions, bit-exact DuckDB oracle, but interpreted higher-order
functions score one pair at a time.  This operator broadcasts the query
matrix and lets each partition score its corpus slice as ONE
(n_rows x dim) @ (dim x n_queries) matmul — the Arrow-batched
"vectorized pandas UDF" route the task brief calls for.  Per-partition
local top-k keeps the shuffle tiny: only n_queries*k rows per partition
reach the final global top-k window.

Float summation order differs from the sequential fold, so this entry
is verified by a RECALL test against the exact baseline (top-k sets
match) rather than a value-hash oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_DDL = "query_id bigint, neighbor_id bigint, sim double"


def cosine_topk_numpy(emb: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    spark = emb.sparkSession
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )  # tiny by construction: the query side is broadcast state
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, qm))

    def _score(batches):
        ids, qmat = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            sims = (cm / norms) @ qmat.T  # (n_rows, n_queries)
            top = min(k, n)
            # local top-k per query within this batch
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            out_q, out_n, out_s = [], [], []
            vec_ids = pdf["vec_id"].to_numpy()
            for qi in range(len(ids)):
                sel = idx[:, qi]
                out_q.extend([ids[qi]] * len(sel))
                out_n.extend(vec_ids[sel])
                out_s.extend(sims[sel, qi])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    local = emb.select("vec_id", "embedding").mapInPandas(_score, schema=OUT_DDL)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        local.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rn")
    )
