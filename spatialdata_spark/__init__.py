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

from spatialdata_spark.api import (
    aggregate,
    are_extents_equal,
    concatenate,
    deepcopy,
    get_bounding_box_corners,
    get_centroids,
    get_element_annotators,
    get_extent,
    get_pyramid_levels,
    get_table_keys,
    force_2d,
    join_spatialelement_table,
    map_raster,
    match_sdata_to_table,
    rasterize,
    rasterize_bins_link_table_to_labels,
    sanitize_table,
    to_circles,
    to_polygons,
    transform,
)
from spatialdata_spark.api import get_dask_backing_files
from spatialdata_spark.catalog import SpatialDataset, sanitize_name
from spatialdata_spark.config import disable_dask_tune_optimization, settings
from spatialdata_spark.formats import SpatialDataFormatType
from spatialdata_spark.operators.container import (
    bounding_box_query_dataset as bounding_box_query,
)
from spatialdata_spark.operators.container import (
    polygon_query_dataset as polygon_query,
)
from spatialdata_spark.operators.rasterize import rasterize_bins, relabel_sequential
from spatialdata_spark.operators.raster import unpad_raster
from spatialdata_spark.operators.relational import (
    filter_by_table_predicate as filter_by_table_query,
)
from spatialdata_spark.operators.relational import (
    element_instance_ids as get_element_instances,
)
from spatialdata_spark.operators.relational import (
    get_values,
    match_element_to_table,
    match_table_to_element,
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
from spatialdata_spark import dataloader, datasets, models, transformations  # noqa: F401

#: reference-API-style entry points (spatialdata's read_zarr / SpatialData)
read_zarr = SpatialDataset.read_zarr
SpatialData = SpatialDataset  # the reference's class name

__version__ = "0.3.0"

__all__ = [
    "SpatialDataset",
    "SpatialDataFormatType",
    "settings",
    "disable_dask_tune_optimization",
    "get_dask_backing_files",
    "SpatialData",
    "BaseTransformation",
    "Identity",
    "MapAxis",
    "Translation",
    "Scale",
    "Affine",
    "Sequence",
    "aggregate",
    "are_extents_equal",
    "bounding_box_query",
    "concatenate",
    "dataloader",
    "datasets",
    "deepcopy",
    "filter_by_table_query",
    "get_bounding_box_corners",
    "get_centroids",
    "get_element_annotators",
    "get_element_instances",
    "get_extent",
    "get_pyramid_levels",
    "get_table_keys",
    "force_2d",
    "get_values",
    "join_spatialelement_table",
    "map_raster",
    "match_element_to_table",
    "match_sdata_to_table",
    "match_table_to_element",
    "models",
    "polygon_query",
    "rasterize",
    "rasterize_bins",
    "rasterize_bins_link_table_to_labels",
    "read_zarr",
    "relabel_sequential",
    "sanitize_name",
    "sanitize_table",
    "to_circles",
    "to_polygons",
    "transform",
    "transform_to_coordinate_system",
    "transformations",
    "unpad_raster",
    "align_elements_using_landmarks",
    "get_transformation_between_landmarks",
]
