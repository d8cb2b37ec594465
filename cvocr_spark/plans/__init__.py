from .job import EXTRACTED_DDL, extract_pages, extraction_kernel_arrow  # noqa: F401
