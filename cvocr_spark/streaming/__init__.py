from .extract_stream import extract_pages_stream, run_stream_to_parquet  # noqa: F401
