from spatialdata_spark.transformations.base import (
    VALID_AXES,
    Affine,
    BaseTransformation,
    Identity,
    MapAxis,
    Scale,
    Sequence,
    Translation,
    get_output_axes,
    decompose_affine,
    scale_radii_factor,
    validate_axes,
)
from spatialdata_spark.transformations.landmarks import (
    align_elements_using_landmarks,
    get_transformation_between_landmarks,
)
from spatialdata_spark.transformations.graph import (
    build_transform_graph,
    estimate_affine_from_landmarks,
    get_transformation_between,
)
from spatialdata_spark.transformations.ngff import (
    NgffAxis,
    NgffCoordinateSystem,
    NgffTransformation,
    get_default_coordinate_system,
)

__all__ = [
    "align_elements_using_landmarks",
    "get_transformation_between_landmarks",
    "VALID_AXES",
    "Affine",
    "BaseTransformation",
    "Identity",
    "MapAxis",
    "Scale",
    "Sequence",
    "Translation",
    "get_output_axes",
    "decompose_affine",
    "scale_radii_factor",
    "validate_axes",
    "build_transform_graph",
    "estimate_affine_from_landmarks",
    "get_transformation_between",
    "NgffAxis",
    "NgffCoordinateSystem",
    "NgffTransformation",
    "get_default_coordinate_system",
]
