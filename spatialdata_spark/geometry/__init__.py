from spatialdata_spark.geometry import predicates, wkb
from spatialdata_spark.geometry.predicates import (
    clip_polygon_convex,
    intersection_area_convex,
    multipolygon_area,
    points_in_multipolygon,
    points_in_polygon,
    points_in_ring,
    polygon_area,
    polygon_centroid,
    ring_area,
    rings_intersect,
)
from spatialdata_spark.geometry.wkb import (
    decode,
    encode_multipolygon,
    encode_point,
    encode_polygon,
    geometry_kind,
    regular_polygon,
)

__all__ = [
    "predicates",
    "wkb",
    "decode",
    "encode_multipolygon",
    "encode_point",
    "encode_polygon",
    "geometry_kind",
    "regular_polygon",
    "clip_polygon_convex",
    "intersection_area_convex",
    "multipolygon_area",
    "points_in_multipolygon",
    "points_in_polygon",
    "points_in_ring",
    "polygon_area",
    "polygon_centroid",
    "ring_area",
    "rings_intersect",
]
