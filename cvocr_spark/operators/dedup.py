"""Deduplication operators over the documents table — the
training-data-pipeline extensions (task brief: exact, MinHash+LSH,
SimHash, n-gram Jaccard; embedding near-dup lives in similarity.py).

All hashing is md5-based (functions/portable.py) so every operator has
an exact DuckDB oracle.  Scale design:

  * exact dedup      — one hash-groupBy shuffle; at 100 TB this is the
    cheapest possible dedup (partial agg combines map-side).
  * minhash + LSH    — signatures are per-row expressions (no shuffle),
    banding turns O(n^2) similarity into an equi-join on band keys:
    shuffle on (band_id, band_val), join only within buckets.  This is
    the path that survives 10^12 docs; the pairwise join never
    materializes the cross product.
  * simhash          — per-row 16-bit signature; near-dup = same
    signature (bucket equi-join), no cross product.
  * n-gram jaccard   — the exact verifier: explode distinct tokens,
    self-join on token, count intersections.  Quadratic in the worst
    case, so it is applied AFTER candidate generation at scale (here:
    a bounded doc subset for the oracle).

For a non-trivial fixture on synthetic data (which has no natural
dups), `with_injected_dups` unions in exact copies with doc_id+offset —
the graft of the reference's augmentation corpus (moreSample.py:24-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

DUP_OFFSET = 100000


def with_injected_dups(docs: DataFrame, every: int = 10) -> DataFrame:
    dups = docs.filter(F.col("doc_id") % every == 0).withColumn(
        "doc_id", F.col("doc_id") + DUP_OFFSET
    )
    return docs.unionByName(dups)


def injected_dups_sql(every: int = 10, where: str = "TRUE") -> str:
    return f"""
    SELECT * FROM documents WHERE {where}
    UNION ALL
    SELECT doc_id + {DUP_OFFSET} AS doc_id, text, lang, source, n_chars
    FROM documents WHERE ({where}) AND doc_id % {every} = 0
    """


def exact_dedup(docs: DataFrame, prefix: int = 40) -> DataFrame:
    """Exact dedup by content hash: keep min doc_id per md5(prefix)."""
    h = F.md5(F.substring("text", 1, prefix))
    return docs.groupBy(h.alias("h")).agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies")
    )


def exact_dedup_sql(prefix: int = 40, corpus: str = "documents") -> str:
    return f"""
    SELECT md5(substr(text, 1, {prefix})) AS h, min(doc_id) AS keeper,
           count(*) AS n_copies
    FROM ({corpus}) GROUP BY 1
    """


MINHASH_K = 8
BANDS = 4  # 4 bands x 2 rows


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """k minhashes over distinct 3-word shingles — pure per-row
    expressions, zero shuffle.  One md5 per shingle (the costly part),
    materialized as an (h1,h2) pair array in a first projection; the k
    signature mins derive from it by double hashing h1 + j*h2."""
    words = P.words_spark("text")
    shingles = f"array_distinct({P.shingles_spark(words)})"
    # spread the CPU-heavy hashing across all cores: a small parquet
    # arrives as 1-2 scan partitions; at real scale the input is already
    # wide and this repartition coalesces away under AQE
    sc = docs.sparkSession.sparkContext
    paired = docs.repartition(sc.defaultParallelism).select(
        "doc_id", F.expr(P.minhash_pairs_spark(shingles)).alias("mhp")
    )
    cols = [F.col("doc_id")] + [
        F.expr(e).alias(f"mh{j}")
        for j, e in enumerate(P.minhash_from_pairs_spark("mhp", MINHASH_K))
    ]
    return paired.select(*cols)


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Band the signatures (2 rows/band) and equi-join on band value:
    candidate near-dup pairs without a cross product."""
    sigs = minhash_signatures(docs)
    band_cols = []
    for b in range(BANDS):
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws("_", f"mh{2 * b}", f"mh{2 * b + 1}").alias("band_val"),
            )
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


def minhash_lsh_pairs_sql(corpus: str = "documents") -> str:
    words = P.words_duck("text")
    shingles = f"list_distinct({P.shingles_duck(words)})"
    mh = P.minhash_from_pairs_duck("mhp", MINHASH_K)
    mh_select = ", ".join(f"{e} AS mh{j}" for j, e in enumerate(mh))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat(mh{2 * b}, '_', mh{2 * b + 1}) AS band_val FROM sigs"
        for b in range(BANDS)
    )
    return f"""
    WITH corpus AS ({corpus}),
    paired AS (SELECT doc_id, {P.minhash_pairs_duck(shingles)} AS mhp FROM corpus),
    sigs AS (SELECT doc_id, {mh_select} FROM paired),
    banded AS ({bands})
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    """


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per doc (bit-majority over salted word hashes)."""
    words = P.words_spark("text")
    return docs.select(
        "doc_id", F.expr(P.simhash_spark(words)).alias("simhash")
    )


def simhash_signatures_sql(corpus: str = "documents") -> str:
    words = P.words_duck("text")
    return f"SELECT doc_id, {P.simhash_duck(words)} AS simhash FROM ({corpus})"


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact token-set Jaccard >= threshold via token self-join — the
    precise verifier run on LSH candidates at scale."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs_sql(corpus: str = "documents", threshold: float = 0.6) -> str:
    return f"""
    WITH corpus AS ({corpus}),
    toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM corpus
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a, b,
           round(cast(inter as double) / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sizes sa ON inter.a = sa.doc_id
               JOIN sizes sb ON inter.b = sb.doc_id
    WHERE round(cast(inter as double) / (sa.sz + sb.sz - inter), 4) >= {threshold}
    """
