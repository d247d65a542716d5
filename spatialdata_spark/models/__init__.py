from spatialdata_spark.models.schemas import (
    IMAGE_LONG_SCHEMA,
    LABELS_LONG_SCHEMA,
    SHAPES_SCHEMA,
    PointsModel,
    ShapesModel,
    LabelsModel,
    ImageModel,
    TableModel,
    get_model,
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
]
