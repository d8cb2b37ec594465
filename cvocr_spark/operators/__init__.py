from . import (  # noqa: F401
    ann_numpy,
    asof,
    dedup,
    ivf,
    multimodal,
    relational,
    scalar_fns,
    simhash64,
    similarity,
    temporal,
    textstats,
    windows,
)
