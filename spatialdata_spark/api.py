"""Reference-parity top-level API.

scverse/spatialdata users drive the library through ~30 top-level names
(``src/spatialdata/__init__.py``); this module provides each of them on
the Spark data model, as thin dispatchers over the operator modules —
so reading reference-style user code against this engine needs only the
import line changed.  Polymorphic entry points (``aggregate``,
``get_centroids``, ``transform``, ``rasterize``, ``to_circles``)
dispatch on the DataFrame schema, which is the Spark analog of the
reference's singledispatch on element type
(``_core/operations/aggregate.py:28``, ``_core/centroids.py:32``,
``_core/operations/transform.py``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from spatialdata_spark.catalog import SpatialDataset, TableMeta, sanitize_name


# ---------------------------------------------------------------------------
# container ops
# ---------------------------------------------------------------------------


def concatenate(
    datasets: list[SpatialDataset],
    region_suffixes: list[str] | None = None,
) -> SpatialDataset:
    """Union of containers (reference `_core/concatenate.py:81-275`):
    element names must stay unique — pass ``region_suffixes`` to rename
    colliding elements (and their table region values) per source."""
    if not datasets:
        raise ValueError("concatenate needs at least one dataset")
    if region_suffixes is not None and len(region_suffixes) != len(datasets):
        raise ValueError("region_suffixes length must match datasets")
    out = SpatialDataset(datasets[0].spark)
    for i, ds in enumerate(datasets):
        suffix = region_suffixes[i] if region_suffixes else ""
        for kind, elems in ds.elements.items():
            for name, df in elems.items():
                new = f"{name}{suffix}"
                if kind == "tables":
                    meta = ds.table_meta.get(name)
                    if meta is not None and suffix:
                        from pyspark.sql import functions as F

                        df = df.withColumn(
                            meta.region_key, F.concat(F.col(meta.region_key), F.lit(suffix))
                        )
                        out.table_meta[new] = TableMeta(
                            region=[f"{r}{suffix}" for r in meta.region],
                            region_key=meta.region_key,
                            instance_key=meta.instance_key,
                        )
                    elif meta is not None:
                        out.table_meta[new] = meta
                    out.elements["tables"][new] = df
                else:
                    out._add(kind, new, df, ds.transforms.get(name))
    return out


def deepcopy(ds: SpatialDataset) -> SpatialDataset:
    return ds.deepcopy()


def get_element_annotators(ds: SpatialDataset, element_name: str) -> list[str]:
    """Names of tables annotating an element (reference
    relational_query.py get_element_annotators)."""
    return sorted(
        tname for tname, tm in ds.table_meta.items() if element_name in tm.region
    )


def sanitize_table(df: DataFrame) -> DataFrame:
    """Rename invalid column names in place of the reference's obs/var
    sanitization (`_core/_utils.py:34-137`)."""
    renames = {c: sanitize_name(c) for c in df.columns if sanitize_name(c) != c}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


# ---------------------------------------------------------------------------
# extents
# ---------------------------------------------------------------------------


def get_extent(ds_or_df, **kw):
    """Container or element extent (reference data_extent.py:100-359)."""
    from spatialdata_spark.operators.container import get_extent_dataset
    from spatialdata_spark.operators.measures import (
        extent_labels,
        extent_points,
        extent_shapes,
    )

    if isinstance(ds_or_df, SpatialDataset):
        return get_extent_dataset(ds_or_df, **kw)
    df = ds_or_df
    if "wkb" in df.columns:
        return extent_shapes(df)
    if "label" in df.columns:
        return extent_labels(df)
    return extent_points(df)


def are_extents_equal(e1: dict, e2: dict, atol: float = 1e-6) -> bool:
    """Reference `_core/data_extent.py are_extents_equal`."""
    if set(e1) != set(e2):
        return False
    return all(
        abs(e1[ax][0] - e2[ax][0]) <= atol and abs(e1[ax][1] - e2[ax][1]) <= atol
        for ax in e1
    )


def get_bounding_box_corners(axes, min_coordinate, max_coordinate) -> np.ndarray:
    """All 2^d corners of a bbox (reference `_core/query/_utils.py`),
    ordered with the first axis varying slowest."""
    mins = np.asarray(min_coordinate, dtype=float)
    maxs = np.asarray(max_coordinate, dtype=float)
    d = len(tuple(axes))
    if len(mins) != d or len(maxs) != d:
        raise ValueError("axes / min / max length mismatch")
    return np.array(
        [[(maxs if (i >> (d - 1 - k)) & 1 else mins)[k] for k in range(d)] for i in range(1 << d)]
    )


def get_pyramid_levels(meta, n_scales: int) -> list[tuple[int, int]]:
    """Shapes of each pyramid level (reference get_pyramid_levels —
    there a DataTree walk, here pure arithmetic on RasterMeta)."""
    return [meta.shape_at(s) for s in range(n_scales)]


# ---------------------------------------------------------------------------
# relational
# ---------------------------------------------------------------------------


def join_spatialelement_table(
    element_df: DataFrame,
    element_name: str,
    element_kind: str,
    table_df: DataFrame,
    how: str = "left",
    **kw,
):
    from spatialdata_spark.operators.relational import join_element_table

    return join_element_table(element_df, element_name, element_kind, table_df, how=how, **kw)


def match_sdata_to_table(ds: SpatialDataset, table_name: str) -> SpatialDataset:
    """Filter every annotated element to the table's instances
    (reference relational_query.py match_sdata_to_table)."""
    from spatialdata_spark.operators.relational import join_element_table

    meta = ds.table_meta[table_name]
    table_df = ds.tables[table_name]
    out = SpatialDataset(ds.spark)
    out.elements["tables"][table_name] = table_df
    out.table_meta[table_name] = meta
    for region in meta.region:
        kind = ds.kind_of(region)
        element_out, _ = join_element_table(
            ds[region],
            region,
            kind,
            table_df,
            how="right",
            region_key=meta.region_key,
            instance_key=meta.instance_key,
        )
        out.elements[kind][region] = element_out
        out.transforms[region] = dict(ds.transforms.get(region, {}))
    return out


# ---------------------------------------------------------------------------
# schema-dispatching polymorphic entry points
# ---------------------------------------------------------------------------


def get_centroids(df: DataFrame) -> DataFrame:
    from spatialdata_spark.operators.measures import (
        centroids_labels,
        centroids_points,
        centroids_shapes,
    )

    if "label" in df.columns:
        return centroids_labels(df)
    if "wkb" in df.columns:
        return centroids_shapes(df)
    return centroids_points(df)


def transform(df: DataFrame, transformation) -> DataFrame:
    from spatialdata_spark.operators.transform import transform_points, transform_shapes

    if "wkb" in df.columns:
        return transform_shapes(df, transformation)
    return transform_points(df, transformation)


def aggregate(
    values: DataFrame,
    by: DataFrame,
    value_col: str | None = None,
    agg_func: str = "count",
    **kw,
) -> DataFrame:
    """Zonal aggregation dispatcher (reference aggregate.py:28-213):
    values points/image × by shapes/labels, chosen from the schemas."""
    from spatialdata_spark.operators.aggregate import (
        aggregate_image_by_labels,
        aggregate_points_by_labels,
        aggregate_points_by_shapes,
        aggregate_shapes_by_shapes,
    )

    by_is_shapes = "wkb" in by.columns
    by_is_labels = "label" in by.columns
    values_is_image = "c" in values.columns and "value" in values.columns
    values_is_shapes = "wkb" in values.columns
    if by_is_labels and values_is_image:
        return aggregate_image_by_labels(values, by, agg_func if agg_func != "count" else "mean")
    if by_is_labels:
        return aggregate_points_by_labels(values, by, value_col=value_col, agg_func=agg_func)
    if by_is_shapes and values_is_shapes:
        return aggregate_shapes_by_shapes(values, by, value_col=value_col, agg_func=agg_func, **kw)
    if by_is_shapes:
        return aggregate_points_by_shapes(values, by, value_col=value_col, agg_func=agg_func, **kw)
    raise ValueError("cannot infer aggregation dispatch from the input schemas")


def to_circles(df: DataFrame, **kw) -> DataFrame:
    from spatialdata_spark.operators.vectorize import labels_to_circles, shapes_to_circles

    if "label" in df.columns:
        return labels_to_circles(df, **kw)
    return shapes_to_circles(df)


def to_polygons(labels_long: DataFrame, **kw) -> DataFrame:
    from spatialdata_spark.operators.vectorize import labels_to_polygons

    return labels_to_polygons(labels_long, **kw)


def rasterize(df: DataFrame, **kw) -> DataFrame:
    """Rasterization dispatcher (reference rasterize.py:616-743):
    points → count-per-pixel binning; circles → full-disk fill;
    polygons → scanline fill."""
    from spatialdata_spark.operators.rasterize import (
        rasterize_circles_fill,
        rasterize_points,
        rasterize_polygons_fill,
    )

    if "radius" in df.columns and "wkb" in df.columns:
        return rasterize_circles_fill(df)
    if "wkb" in df.columns:
        return rasterize_polygons_fill(df)
    return rasterize_points(df, **kw)


def map_raster(tiles: DataFrame, fn, meta, depth: int = 0, **kw) -> DataFrame:
    """Reference map_raster(func, depth=halo) on the tile table."""
    from spatialdata_spark.operators.raster import map_tiles, map_tiles_with_halo

    if depth > 0:
        return map_tiles_with_halo(tiles, fn, meta, halo=depth, **kw)
    return map_tiles(tiles, fn, meta, **kw)


def rasterize_bins_link_table_to_labels(
    ds: SpatialDataset, table_name: str, labels_name: str
) -> SpatialDataset:
    """Point the annotation table at a labels raster produced by
    rasterize_bins (reference rasterize_bins.py
    rasterize_bins_link_table_to_labels): the table's region metadata is
    rewritten to the labels element, rows re-keyed to it."""
    from pyspark.sql import functions as F

    meta = ds.table_meta[table_name]
    if labels_name not in ds.elements["labels"]:
        raise ValueError(f"labels element {labels_name!r} not in the dataset")
    out = ds.deepcopy()
    out.elements["tables"][table_name] = ds.tables[table_name].withColumn(
        meta.region_key, F.lit(labels_name)
    )
    out.table_meta[table_name] = TableMeta(
        region=[labels_name], region_key=meta.region_key, instance_key=meta.instance_key
    )
    return out


def get_table_keys(ds: SpatialDataset, table_name: str) -> tuple[list[str], str, str]:
    """(region, region_key, instance_key) of an annotation table
    (reference models.py:1345 get_table_keys)."""
    tm = ds.table_meta[table_name]
    return tm.region, tm.region_key, tm.instance_key


def force_2d(df: DataFrame) -> DataFrame:
    """Drop the z dimension (reference models force_2d): points lose the
    z column; labels additionally collapse duplicate (y, x) pixels by
    max label (deterministic projection)."""
    from pyspark.sql import functions as F

    if "z" not in df.columns:
        return df
    out = df.drop("z")
    if "label" in df.columns:
        others = [c for c in out.columns if c not in ("y", "x", "label")]
        agg = [F.max("label").alias("label")] + [F.first(c).alias(c) for c in others]
        out = out.groupBy("y", "x").agg(*agg)
    return out


def get_dask_backing_files(ds_or_df) -> list[str]:
    """Files backing an element or every element of a dataset —
    the engine analog of the reference's dask-graph file scan
    (``_io/_utils.py:251``): Spark tracks the scan's input files in
    the plan, exposed via ``DataFrame.inputFiles``."""
    if isinstance(ds_or_df, DataFrame):
        return sorted(set(ds_or_df.inputFiles()))
    files: set[str] = set()
    for kind_map in ds_or_df.elements.values():
        for df in kind_map.values():
            files.update(df.inputFiles())
    return sorted(files)
