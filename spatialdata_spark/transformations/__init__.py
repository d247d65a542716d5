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
from spatialdata_spark.transformations.ops import (
    get_transformation,
    get_transformation_between_coordinate_systems,
    remove_transformation,
    remove_transformations_to_coordinate_system,
    set_transformation,
)
from spatialdata_spark.transformations.ngff import (
    NgffAxis,
    NgffCoordinateSystem,
    NgffTransformation,
    get_default_coordinate_system,
)

__all__ = [
    "get_transformation",
    "set_transformation",
    "remove_transformation",
    "remove_transformations_to_coordinate_system",
    "get_transformation_between_coordinate_systems",
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
