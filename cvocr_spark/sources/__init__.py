from .tableio import ParquetTableIO, run_extraction  # noqa: F401
