"""Container-level operations: query dispatch over every element, global
extent, data-extent normalization.

Reference: bounding_box_query(SpatialData) — spatial_query.py:508-534;
polygon_query — :874-975; get_extent(SpatialData) — data_extent.py:100-166;
transform_to_data_extent — _core/operations/_utils.py:13-141;
QueryManager facade — _core/spatialdata.py:2466-2525.

Everything here is driver-side planning: per element, the transform
resolves through the CS graph and the data-side work is delegated to
the per-kind operators (Catalyst filter jobs); tables are filtered by
a semi-join against surviving element instances.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spatialdata_spark.catalog import SpatialDataset
from spatialdata_spark.operators.measures import (
    extent_labels,
    extent_points,
    extent_shapes,
    transformed_bbox_corners,
)
from spatialdata_spark.operators.relational import join_element_table
from spatialdata_spark.operators.spatial_query import (
    bounding_box_query_points,
    bounding_box_query_raster_long,
    bounding_box_query_shapes,
    polygon_query_points,
    polygon_query_shapes,
)
from spatialdata_spark.transformations import Scale, Sequence, Translation


def bounding_box_query_dataset(
    ds: SpatialDataset,
    axes: tuple[str, ...],
    min_coordinate,
    max_coordinate,
    target_coordinate_system: str = "global",
    filter_table: bool = True,
) -> SpatialDataset:
    """Dispatch the bbox query across all elements that reach the target
    CS (reference: spatial_query.py:508-534), then filter annotating
    tables to surviving instances."""
    out = SpatialDataset(ds.spark)
    for kind in ("points", "shapes", "labels"):
        for name, df in ds.elements[kind].items():
            try:
                t = ds.get_transformation_between(name, target_coordinate_system)
            except (KeyError, ValueError):
                continue  # not connected to the target CS -> excluded
            if kind == "points":
                q = bounding_box_query_points(df, axes, min_coordinate, max_coordinate, t)
            elif kind == "shapes":
                q = bounding_box_query_shapes(df, axes, min_coordinate, max_coordinate, t)
            else:
                q = bounding_box_query_raster_long(df, axes, min_coordinate, max_coordinate, t)
            out.elements[kind][name] = q
            out.transforms[name] = dict(ds.transforms.get(name, {}))
    _refilter_tables(ds, out, filter_table)
    return out


def polygon_query_dataset(
    ds: SpatialDataset,
    polygon_ring: np.ndarray,
    target_coordinate_system: str = "global",
    filter_table: bool = True,
) -> SpatialDataset:
    """Polygon query across the container (reference:
    spatial_query.py:874-975; rasters fall back to the polygon's bbox)."""
    ring = np.asarray(polygon_ring, dtype=float)
    out = SpatialDataset(ds.spark)
    for kind in ("points", "shapes", "labels"):
        for name, df in ds.elements[kind].items():
            try:
                t = ds.get_transformation_between(name, target_coordinate_system)
            except (KeyError, ValueError):
                continue
            if kind == "points":
                q = polygon_query_points(df, ring, t)
            elif kind == "shapes":
                q = polygon_query_shapes(df, ring, t)
            else:
                mins = ring.min(axis=0)
                maxs = ring.max(axis=0)
                q = bounding_box_query_raster_long(df, ("x", "y"), mins, maxs, t)
            out.elements[kind][name] = q
            out.transforms[name] = dict(ds.transforms.get(name, {}))
    _refilter_tables(ds, out, filter_table)
    return out


def _refilter_tables(src: SpatialDataset, out: SpatialDataset, filter_table: bool) -> None:
    """Tables follow their annotated elements: rows whose instance
    survives the query (reference: query/_utils.py:199-231)."""
    for tname, tdf in src.elements["tables"].items():
        meta = src.table_meta.get(tname)
        if meta is None or not filter_table:
            out.elements["tables"][tname] = tdf
            if meta:
                out.table_meta[tname] = meta
            continue
        parts = []
        for region in meta.region:
            if region not in out.element_names():
                continue
            kind = out.kind_of(region)
            _, table_out = join_element_table(
                out[region], region, kind, tdf, how="left",
                region_key=meta.region_key, instance_key=meta.instance_key,
            )
            parts.append(table_out)
        if parts:
            result = parts[0]
            for p in parts[1:]:
                result = result.unionByName(p)
            out.elements["tables"][tname] = result
            out.table_meta[tname] = meta


def get_extent_dataset(
    ds: SpatialDataset,
    target_coordinate_system: str = "global",
    exact: bool = True,
) -> dict[str, tuple[float, float]]:
    """Union of per-element extents in the target CS (reference:
    data_extent.py:100-166).  exact=True transforms per-element extents
    of the *data*; exact=False transforms only the bbox corners
    (data_extent.py:320-359) — both run one tiny agg per element."""
    total: dict[str, tuple[float, float]] = {}
    for kind, fn in (("points", extent_points), ("shapes", extent_shapes), ("labels", extent_labels)):
        for name, df in ds.elements[kind].items():
            try:
                t = ds.get_transformation_between(name, target_coordinate_system)
            except (KeyError, ValueError):
                continue
            ext = fn(df)
            ext = transformed_bbox_corners(ext, t)
            for ax, (lo, hi) in ext.items():
                if ax in total:
                    total[ax] = (min(total[ax][0], lo), max(total[ax][1], hi))
                else:
                    total[ax] = (lo, hi)
    return total


def transform_to_data_extent(
    ds: SpatialDataset,
    target_coordinate_system: str = "global",
    target_width: float = 1000.0,
) -> SpatialDataset:
    """Normalize the container into [0, target_width] pixel space of its
    own extent (reference: _core/operations/_utils.py:13-141): compute
    the global extent, then prepend a translate+scale to every
    element's transform into the target CS."""
    ext = get_extent_dataset(ds, target_coordinate_system)
    if not ext:
        return ds
    x0, x1 = ext["x"]
    y0, y1 = ext["y"]
    span = max(x1 - x0, y1 - y0) or 1.0
    s = target_width / span
    norm = Sequence(
        [Translation([-x0, -y0], ("x", "y")), Scale([s, s], ("x", "y"))]
    )
    out = SpatialDataset(ds.spark)
    out.elements = {k: dict(v) for k, v in ds.elements.items()}
    out.table_meta = dict(ds.table_meta)
    for name, cs_map in ds.transforms.items():
        new_map = dict(cs_map)
        if target_coordinate_system in new_map:
            new_map[target_coordinate_system] = Sequence([new_map[target_coordinate_system], norm])
        out.transforms[name] = new_map
    return out


class QueryManager:
    """``ds.query.bounding_box(...)`` fluent facade
    (reference: _core/spatialdata.py:2466-2525)."""

    def __init__(self, ds: SpatialDataset):
        self._ds = ds

    def bounding_box(self, axes, min_coordinate, max_coordinate, target_coordinate_system="global", filter_table=True):
        return bounding_box_query_dataset(
            self._ds, axes, min_coordinate, max_coordinate, target_coordinate_system, filter_table
        )

    def polygon(self, polygon_ring, target_coordinate_system="global", filter_table=True):
        return polygon_query_dataset(self._ds, polygon_ring, target_coordinate_system, filter_table)
