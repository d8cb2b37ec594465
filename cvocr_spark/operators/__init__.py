from . import dedup, multimodal, relational, similarity, textstats, windows  # noqa: F401
