from .extract_stream import extract_pages_stream, run_stream_to_parquet  # noqa: F401
from .stateful import dedup_urls_stream, windowed_counts_stream  # noqa: F401
