"""spatialdata_spark — a PySpark-native spatial-omics analytics engine.

Re-expresses the query/data-processing capabilities of scverse/spatialdata
(the reference, a dask/xarray/geopandas in-memory framework) on Spark
DataFrames/SQL.  The design is Spark-first: every operator is a pure
``DataFrame -> DataFrame`` function whose plan Catalyst can optimize
(predicate pushdown, column pruning, broadcast joins, AQE); Python/Arrow
UDFs are used only where DataFrame expressions genuinely cannot express
the semantics (exact geometry predicates, raster tile kernels).

Data model mapping (see SURVEY.md §1.5):

* points    -> DataFrame ``(x double, y double[, z double], ...columns)``
* shapes    -> DataFrame ``(shape_id long, kind string, wkb binary,
               minx,miny,maxx,maxy double[, radius double])``
* labels    -> long-form DataFrame ``(y long, x long[, z long], label long)``
* images    -> long-form ``(c, y, x, value)`` or tile table
               ``(scale, c, ty, tx, tile binary)``
* tables    -> ``obs`` DataFrame (+ long-form ``X`` and ``var``)
* transforms -> a tiny driver-side catalog: element -> {cs -> Transformation}
"""

from spatialdata_spark.catalog import SpatialDataset
from spatialdata_spark.operators.container import (
    bounding_box_query_dataset as bounding_box_query,
)
from spatialdata_spark.operators.container import (
    polygon_query_dataset as polygon_query,
)
from spatialdata_spark.operators.transform import transform_to_coordinate_system
from spatialdata_spark.transformations import (
    Affine,
    BaseTransformation,
    Identity,
    MapAxis,
    Scale,
    Sequence,
    Translation,
    align_elements_using_landmarks,
    get_transformation_between_landmarks,
)

#: reference-API-style entry points (spatialdata's read_zarr / blobs)
read_zarr = SpatialDataset.read_zarr

__version__ = "0.2.0"

__all__ = [
    "SpatialDataset",
    "BaseTransformation",
    "Identity",
    "MapAxis",
    "Translation",
    "Scale",
    "Affine",
    "Sequence",
    "bounding_box_query",
    "polygon_query",
    "transform_to_coordinate_system",
    "align_elements_using_landmarks",
    "get_transformation_between_landmarks",
    "read_zarr",
]
