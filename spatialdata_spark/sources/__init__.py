from spatialdata_spark.sources.zarrio import (
    read_zarr_store,
    read_zarr_tiles,
    write_tiles_to_zarr,
    write_zarr_store,
    zarr_read_array,
    zarr_write_array,
)
from spatialdata_spark.sources.readers import (
    read_events,
    read_events_stream,
    read_labels_long,
    read_points,
    read_raster_tiles,
    read_shapes,
    shapes_from_geoparquet,
)

__all__ = [
    "read_events",
    "read_events_stream",
    "read_labels_long",
    "read_points",
    "read_raster_tiles",
    "read_shapes",
    "shapes_from_geoparquet",
    "read_zarr_store",
    "read_zarr_tiles",
    "write_tiles_to_zarr",
    "write_zarr_store",
    "zarr_read_array",
    "zarr_write_array",
]
