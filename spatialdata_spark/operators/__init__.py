from spatialdata_spark.operators import (
    aggregate,
    container,
    measures,
    raster,
    rasterize,
    relational,
    spatial_query,
    transform,
    vectorize,
)

__all__ = [
    "aggregate",
    "container",
    "measures",
    "raster",
    "rasterize",
    "relational",
    "spatial_query",
    "transform",
    "vectorize",
]
