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
            blobs = pdf["text"].map(lambda t: t.encode("utf-8"))
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
       cast(octet_length(encode(text)) as int) AS n_bytes,
       cast(octet_length(encode(text)) % 640 + 1 as int) AS fake_width,
       cast(octet_length(encode(text)) % 480 + 1 as int) AS fake_height,
       md5(text) AS content_md5
FROM documents
"""
