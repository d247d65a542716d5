from spatialdata_spark.models.compat import (
    SpatialElement,
    check_target_region_column_symmetry,
    get_channel_names,
    points_dask_dataframe_to_geopandas,
    points_geopandas_to_dask_dataframe,
    set_channel_names,
    validate_axes,
    validate_axis_name,
)
from spatialdata_spark.models.schemas import (
    C,
    IMAGE_LONG_SCHEMA,
    LABELS_LONG_SCHEMA,
    SHAPES_SCHEMA,
    X,
    Y,
    Z,
    Image2DModel,
    Image3DModel,
    ImageModel,
    Labels2DModel,
    Labels3DModel,
    LabelsModel,
    PointsModel,
    ShapesModel,
    TableModel,
    get_axes_names,
    get_model,
    get_spatial_axes,
    validate_element,
)

__all__ = [
    "IMAGE_LONG_SCHEMA",
    "LABELS_LONG_SCHEMA",
    "SHAPES_SCHEMA",
    "PointsModel",
    "ShapesModel",
    "LabelsModel",
    "ImageModel",
    "TableModel",
    "get_model",
    "Image2DModel",
    "Image3DModel",
    "Labels2DModel",
    "Labels3DModel",
    "C",
    "Z",
    "Y",
    "X",
    "get_axes_names",
    "get_spatial_axes",
    "validate_element",
    "SpatialElement",
    "validate_axes",
    "validate_axis_name",
    "get_channel_names",
    "set_channel_names",
    "points_geopandas_to_dask_dataframe",
    "points_dask_dataframe_to_geopandas",
    "check_target_region_column_symmetry",
    "get_table_keys",
    "force_2d",
]

def __getattr__(name):
    # get_table_keys / force_2d live on the api facade; late-bind to
    # avoid the circular import (api imports models schemas)
    if name in ("get_table_keys", "force_2d"):
        from spatialdata_spark import api

        return getattr(api, name)
    raise AttributeError(name)
