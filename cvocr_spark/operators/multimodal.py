"""Multimodal-column plumbing — opaque binary blobs + typed metadata.

The task brief requires the Spark-side plumbing (schema, partitioning,
Arrow batch shape) to be real and tested while the actual image/audio
decode is STUBBED (the decode libraries are not in this container).

`decode_stub` is the clearly-marked stub: a real deployment swaps in
PIL/ffmpeg there; everything around it — the mapInPandas batching, the
binary column handling, the metadata schema — is production-shaped.
This mirrors how the reference isolates its heavy per-patch recognizers
behind a dispatch seam (reco.py:94-148).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, content_md5 string"
)


def decode_stub(blob: bytes) -> dict:
    """STUB decoder.  A real implementation would be:

        from PIL import Image; img = Image.open(io.BytesIO(blob)); ...

    which is unavailable here; instead we emit a DETERMINISTIC fake
    derived only from the bytes, so tests and oracles stay exact.
    Raising path kept for parity with a real decoder's failure mode."""
    if blob is None:
        raise NotImplementedError("real media decode not available in this container")
    return {
        "n_bytes": len(blob),
        "fake_width": len(blob) % 640 + 1,
        "fake_height": len(blob) % 480 + 1,
        "content_md5": hashlib.md5(blob).hexdigest(),
    }


def media_metadata(docs: DataFrame) -> DataFrame:
    """documents.text treated as an opaque binary payload: encode ->
    mapInPandas (Arrow-batched; one pandas frame per batch, never
    per-row Python UDFs) -> typed metadata table."""

    def _run(batches):
        for pdf in batches:
            blobs = pdf["text"].map(lambda t: (t or "").encode("utf-8"))
            metas = blobs.map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": metas.map(lambda m: m["n_bytes"]).astype("int32"),
                    "fake_width": metas.map(lambda m: m["fake_width"]).astype("int32"),
                    "fake_height": metas.map(lambda m: m["fake_height"]).astype("int32"),
                    "content_md5": metas.map(lambda m: m["content_md5"]),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(_run, schema=MEDIA_META_DDL)


MEDIA_METADATA_SQL = """
SELECT doc_id,
       cast(octet_length(encode(coalesce(text, ''))) as int) AS n_bytes,
       cast(octet_length(encode(coalesce(text, ''))) % 640 + 1 as int) AS fake_width,
       cast(octet_length(encode(coalesce(text, ''))) % 480 + 1 as int) AS fake_height,
       md5(coalesce(text, '')) AS content_md5
FROM documents
"""


# -- resize / frame-sample stubs (brief: image/audio/video as opaque
# binary + typed metadata; decode stubbed, plumbing real) -------------------

RESIZED_DDL = "doc_id bigint, out_w int, out_h int, thumb binary"


def resize_stub(blob: bytes, max_side: int) -> tuple[int, int, bytes]:
    """STUB resize.  Real impl: PIL thumbnail.  Deterministic fake:
    scaled dims from the fake decode + a content-derived 'thumbnail'
    (first 64 bytes) so downstream schema/partitioning is exercised
    with real binary payloads."""
    meta = decode_stub(blob)
    w, h = meta["fake_width"], meta["fake_height"]
    scale = min(1.0, max_side / max(w, h))
    return max(1, int(w * scale)), max(1, int(h * scale)), blob[:64]


def resize_images(docs: DataFrame, max_side: int = 128) -> DataFrame:
    """binary column -> resized thumbnail column via mapInPandas."""

    def _run(batches):
        for pdf in batches:
            blobs = pdf["text"].map(lambda t: (t or "").encode("utf-8"))
            dims = blobs.map(lambda b: resize_stub(b, max_side))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": dims.map(lambda d: d[0]).astype("int32"),
                    "out_h": dims.map(lambda d: d[1]).astype("int32"),
                    "thumb": dims.map(lambda d: d[2]),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(_run, schema=RESIZED_DDL)


FRAMES_DDL = "doc_id bigint, frame_idx int, frame binary"


def frame_sample(docs: DataFrame, every_n: int = 3, max_frames: int = 4) -> DataFrame:
    """video-blob -> sampled frames (1 row per frame): the doc->frames
    UDTF shape.  STUB: 'frames' are deterministic 32-byte slices at
    every_n strides; a real impl swaps in ffmpeg keyframe extraction."""

    def _run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                blob = (t or "").encode("utf-8")
                for i in range(max_frames):
                    off = i * every_n * 32
                    if off >= len(blob):
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(blob[off : off + 32])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(_run, schema=FRAMES_DDL)


def frame_sample_digest(docs: DataFrame, every_n: int = 3, max_frames: int = 4) -> DataFrame:
    """Oracle-facing wrapper: the binary frames flow through mapInPandas
    (the real plumbing under test), then are digested to md5 + length —
    raw BINARY in a compared result would hash engine-dependently
    (Spark rows yield bytearray, DuckDB bytes)."""
    from pyspark.sql import functions as F

    frames = frame_sample(docs, every_n, max_frames)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("int").alias("frame_bytes"),
    )


def media_pipeline(docs: DataFrame, max_side: int = 128, every_n: int = 3, max_frames: int = 4) -> DataFrame:
    """Both mapInPandas media stages in one checked result: sampled
    frame digests joined to the resize output (thumb digested to
    md5+length — raw BINARY compares engine-dependently).  One contract
    slot exercises the doc->frames UDTF shape AND the 1:1 resize shape;
    the join key is doc_id, so the (tiny) per-doc resize side
    broadcasts under AQE while frames stream."""
    from pyspark.sql import functions as F

    frames = frame_sample_digest(docs, every_n, max_frames)
    resized = resize_images(docs, max_side).select(
        "doc_id",
        "out_w",
        "out_h",
        F.md5("thumb").alias("thumb_md5"),
        F.length("thumb").cast("int").alias("thumb_bytes"),
    )
    # r5: the metadata stage rides the same slot (its standalone
    # multimodal_meta contract slot was traded for webtext_analytics)
    # so ALL THREE mapInPandas stages are exercised by one checked
    # result — doc->frames UDTF, 1:1 resize, 1:1 metadata
    meta = media_metadata(docs).select("doc_id", "n_bytes", "content_md5")
    return frames.join(resized, "doc_id").join(meta, "doc_id").select(
        "doc_id", "frame_idx", "frame_md5", "frame_bytes",
        "out_w", "out_h", "thumb_md5", "thumb_bytes",
        "n_bytes", "content_md5",
    )


def media_pipeline_sql(max_side: int = 128, every_n: int = 3, max_frames: int = 4) -> str:
    """Frames oracle joined to the resize-stub arithmetic: scaled dims
    from the deterministic fake decode (ascii corpus => byte == char,
    so VARCHAR substring md5s the same bytes Spark's binary md5 sees).
    int(w * scale) truncates in Python; floor() matches for these
    positive values."""
    frames = frame_sample_sql(every_n, max_frames)
    return f"""
    WITH frames AS ({frames}),
    meta AS (
      SELECT doc_id,
             octet_length(encode(coalesce(text, ''))) % 640 + 1 AS w,
             octet_length(encode(coalesce(text, ''))) % 480 + 1 AS h,
             substring(coalesce(text, ''), 1, 64) AS thumb
      FROM documents
    ),
    resized AS (
      SELECT doc_id,
             cast(greatest(1, floor(w * least(1.0, {max_side}.0 / greatest(w, h)))) as int) AS out_w,
             cast(greatest(1, floor(h * least(1.0, {max_side}.0 / greatest(w, h)))) as int) AS out_h,
             md5(thumb) AS thumb_md5,
             cast(octet_length(encode(thumb)) as int) AS thumb_bytes
      FROM meta
    )
    SELECT f.doc_id, f.frame_idx, f.frame_md5, f.frame_bytes,
           r.out_w, r.out_h, r.thumb_md5, r.thumb_bytes,
           cast(octet_length(encode(coalesce(d.text, ''))) as int) AS n_bytes,
           md5(coalesce(d.text, '')) AS content_md5
    FROM frames f
    JOIN resized r ON f.doc_id = r.doc_id
    JOIN documents d ON f.doc_id = d.doc_id
    """


def frame_sample_sql(every_n: int = 3, max_frames: int = 4) -> str:
    """DuckDB oracle for the frame-sample stub: same slices via range.
    DuckDB's md5/substring are VARCHAR-only; the corpus text is ascii
    (byte == char), so string slices hash the same utf-8 bytes Spark's
    binary md5 sees."""
    return f"""
    WITH f AS (
      SELECT doc_id, unnest(range({max_frames})) AS frame_idx, text
      FROM documents
    )
    SELECT doc_id, cast(frame_idx as int) AS frame_idx,
           md5(substring(coalesce(text, ''), cast(frame_idx * {every_n} * 32 + 1 as int), 32)) AS frame_md5,
           cast(octet_length(encode(substring(coalesce(text, ''), cast(frame_idx * {every_n} * 32 + 1 as int), 32))) as int) AS frame_bytes
    FROM f
    WHERE frame_idx * {every_n} * 32 < octet_length(encode(coalesce(text, '')))
    """
