from . import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    scalar_fns,
    similarity,
    textstats,
    windows,
)
