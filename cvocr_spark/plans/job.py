"""Stage A — the distributed extraction job (SURVEY §3 graft lifecycle).

    read -> select(url, warc_ts, html)          # column pruning BEFORE the
                                                # opaque Arrow stage, so the
                                                # parquet scan skips text/lang
         -> cheap native-expr prefilter         # Sparser-style: prune rows
                                                # without entering Python
         -> repartition(n, sha2(url, 256))      # salted by url-hash: defeats
                                                # host/crawl clustering skew
                                                # (north_rule requirement)
         -> mapInArrow(kernel)                  # THE single JVM->Python
                                                # boundary, mirroring the
                                                # reference's single C++->Py
                                                # boundary (reco.py:232)
         -> write                               # via sources.tableio

All per-doc phases (P1..C3, W7) are fused inside the one Arrow stage —
no intermediate shuffle between them (SURVEY §4 "pipelining" row).
"""

from __future__ import annotations

import time

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import DEFAULT_CONFIG, KernelConfig, extract

# the `extracted` table schema (FIXTURES.md §2 golden + lineage extras)
EXTRACTED_DDL = (
    "url string, warc_ts timestamp, text string, "
    "spans array<struct<block_id:int,char_start:int,char_end:int,cls:string>>, "
    "n_blocks int, score double, n_bytes bigint, flags string, proc_us bigint"
)

_SPAN_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("block_id", pa.int32()),
            pa.field("char_start", pa.int32()),
            pa.field("char_end", pa.int32()),
            pa.field("cls", pa.string()),
        ]
    )
)

_EXTRACTED_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("text", pa.string()),
        pa.field("spans", _SPAN_TYPE),
        pa.field("n_blocks", pa.int32()),
        pa.field("score", pa.float64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("flags", pa.string()),
        pa.field("proc_us", pa.int64()),
    ]
)


def extraction_kernel_arrow(cfg: KernelConfig = DEFAULT_CONFIG):
    """Returns the mapInArrow batch driver: per Arrow batch, run the pure
    kernel per doc and emit the extracted schema.  Vectorized transfer,
    scalar per-doc parse loop inside the batch (SURVEY §4 codegen row)."""

    def _run(batches):
        for rb in batches:
            urls = rb.column("url").to_pylist()
            tss = rb.column("warc_ts")
            htmls = rb.column("html").to_pylist()
            texts, spans, n_blocks, scores, n_bytes, flags, proc_us = (
                [], [], [], [], [], [], []
            )
            for h in htmls:
                t0 = time.perf_counter_ns()
                r = extract(h, cfg)
                dt_us = (time.perf_counter_ns() - t0) // 1000
                texts.append(r.text)
                spans.append(
                    [
                        {"block_id": b, "char_start": s, "char_end": e, "cls": c}
                        for (b, s, e, c) in r.spans
                    ]
                )
                n_blocks.append(r.n_blocks)
                scores.append(r.score)
                n_bytes.append(len(h) if h is not None else 0)
                flags.append(r.flags)
                proc_us.append(dt_us)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    tss.cast(pa.timestamp("us")),
                    pa.array(texts, pa.string()),
                    pa.array(spans, _SPAN_TYPE),
                    pa.array(n_blocks, pa.int32()),
                    pa.array(scores, pa.float64()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(flags, pa.string()),
                    pa.array(proc_us, pa.int64()),
                ],
                schema=_EXTRACTED_ARROW,
            )

    return _run


BLOCKS_DDL = (
    "url string, block_id int, depth int, tag string, text string, "
    "cls string, conf double, "
    "candidates array<struct<cls:string,score:double>>, "
    "n_chars int, link_density double, text_density double, "
    "boiler_ctx boolean"
)

_CANDIDATES_TYPE = pa.list_(
    pa.struct([pa.field("cls", pa.string()), pa.field("score", pa.float64())])
)

_BLOCKS_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("block_id", pa.int32()),
        pa.field("depth", pa.int32()),
        pa.field("tag", pa.string()),
        pa.field("text", pa.string()),
        pa.field("cls", pa.string()),
        pa.field("conf", pa.float64()),
        pa.field("candidates", _CANDIDATES_TYPE),
        pa.field("n_chars", pa.int32()),
        pa.field("link_density", pa.float64()),
        pa.field("text_density", pa.float64()),
        pa.field("boiler_ctx", pa.bool_()),
    ]
)


def blocks_kernel_arrow(cfg: KernelConfig = DEFAULT_CONFIG):
    """doc -> n block rows: the UDTF-shaped stage (SURVEY §2g: 'the
    entire C++/Py kernel is, morally, one UDTF').  Emits the classified
    per-block intermediate table — the graft of the region.txt IR
    (reference cut.h:863-893, parsed back at reco.py:194-216)."""

    def _run(batches):
        for rb in batches:
            urls = rb.column("url").to_pylist()
            htmls = rb.column("html").to_pylist()
            cols: dict[str, list] = {
                k: []
                for k in (
                    "url block_id depth tag text cls conf candidates n_chars "
                    "link_density text_density boiler_ctx".split()
                )
            }
            for u, h in zip(urls, htmls):
                r = extract(h, cfg)
                for b in r.blocks:
                    cols["url"].append(u)
                    cols["block_id"].append(b.block_id)
                    cols["depth"].append(b.depth)
                    cols["tag"].append(b.tag)
                    cols["text"].append(b.text)
                    cols["cls"].append(b.cls)
                    cols["conf"].append(b.conf)
                    cols["candidates"].append(
                        [{"cls": c, "score": s} for (c, s) in b.candidates]
                    )
                    cols["n_chars"].append(b.n_chars)
                    cols["link_density"].append(b.link_density)
                    cols["text_density"].append(b.text_density)
                    cols["boiler_ctx"].append(b.boiler_ctx)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["url"], pa.string()),
                    pa.array(cols["block_id"], pa.int32()),
                    pa.array(cols["depth"], pa.int32()),
                    pa.array(cols["tag"], pa.string()),
                    pa.array(cols["text"], pa.string()),
                    pa.array(cols["cls"], pa.string()),
                    pa.array(cols["conf"], pa.float64()),
                    pa.array(cols["candidates"], _CANDIDATES_TYPE),
                    pa.array(cols["n_chars"], pa.int32()),
                    pa.array(cols["link_density"], pa.float64()),
                    pa.array(cols["text_density"], pa.float64()),
                    pa.array(cols["boiler_ctx"], pa.bool_()),
                ],
                schema=_BLOCKS_ARROW,
            )

    return _run


def extract_blocks(
    pages: DataFrame,
    n_partitions: int | None = None,
    cfg: KernelConfig = DEFAULT_CONFIG,
    salted: bool = False,
) -> DataFrame:
    """pages -> classified blocks table (FIXTURES.md §3)."""
    slim = pages.select("url", "html").filter(
        F.col("html").isNotNull() & (F.length("html") > 0)
    )
    if salted and n_partitions:
        slim = slim.repartition(n_partitions, F.sha2(F.col("url"), 256))
    return slim.mapInArrow(blocks_kernel_arrow(cfg), schema=BLOCKS_DDL)


def extract_pages(
    pages: DataFrame,
    n_partitions: int | None = None,
    cfg: KernelConfig = DEFAULT_CONFIG,
    salted: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> extracted DataFrame.

    * column-prunes to (url, warc_ts, html) before the Arrow stage so the
      scan's ReadSchema stays minimal (SURVEY §4 ROI-crop row);
    * prefilters empty html with a native expression (no Python);
    * salted repartition by sha2(url) — uniform partitions regardless of
      host clustering; at 10^12 rows this is the difference between a
      straggler-free stage and a handful of hot hosts pinning executors.
    """
    slim = pages.select("url", "warc_ts", "html").filter(
        F.col("html").isNotNull() & (F.length("html") > 0)
    )
    if salted:
        if n_partitions:
            slim = slim.repartition(n_partitions, F.sha2(F.col("url"), 256))
        else:
            slim = slim.repartition(F.sha2(F.col("url"), 256))
    return slim.mapInArrow(extraction_kernel_arrow(cfg), schema=EXTRACTED_DDL)
