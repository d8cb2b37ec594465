"""cvocr_spark — a PySpark-native web-scale main-content extraction engine.

A from-scratch graft of Halfish/cvOCR's staged document-content
extraction (reference at /root/reference, C++/OpenCV + Python) onto
Common-Crawl-style HTML tables: DataFrame + Arrow-vectorized stages
only, designed for a 10^12-row partitioned table on a multi-executor
cluster (tested on local[N]).

Layout:
  kernel.py       pure-Python per-doc extraction kernel (runs in mapInArrow)
  fixtures.py     deterministic synthetic page-corpus generator
  session.py      tuned SparkSession builder
  plans/          the Stage-A extraction job (read->repartition->mapInArrow->write)
  sources/        TableIO seam: parquet + lineage manifests + exact resume
  operators/      relational operators (dedup, similarity, sessionize, topk, ...)
  functions/      column-level text/array functions (langid, quality, minhash, ...)
  streaming/      Structured Streaming wrapper of the same kernel
"""

__version__ = "0.1.0"
