from spatialdata_spark.pipeline import (
    bpe,
    classify,
    clustering,
    codecs,
    dedup,
    filters,
    fingerprints,
    graph,
    multimodal,
    search,
    similarity,
    textstats,
)

__all__ = [
    "bpe",
    "classify",
    "clustering",
    "codecs",
    "dedup",
    "filters",
    "fingerprints",
    "graph",
    "multimodal",
    "search",
    "similarity",
    "textstats",
]
