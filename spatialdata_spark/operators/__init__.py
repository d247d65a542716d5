from spatialdata_spark.operators import (
    aggregate,
    measures,
    rasterize,
    relational,
    spatial_query,
    transform,
    vectorize,
)

__all__ = [
    "aggregate",
    "measures",
    "rasterize",
    "relational",
    "spatial_query",
    "transform",
    "vectorize",
]
