from . import (  # noqa: F401
    ann_numpy,
    asof,
    dedup,
    multimodal,
    relational,
    scalar_fns,
    similarity,
    temporal,
    textstats,
    windows,
)
