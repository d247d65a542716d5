from spatialdata_spark.sources.readers import (
    read_events,
    read_events_stream,
    read_labels_long,
    read_points,
    read_raster_tiles,
    read_shapes,
)

__all__ = [
    "read_events",
    "read_events_stream",
    "read_labels_long",
    "read_points",
    "read_raster_tiles",
    "read_shapes",
]
