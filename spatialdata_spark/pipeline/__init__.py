from spatialdata_spark.pipeline import (
    bpe,
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
