"""Reference-parity model helpers that don't fit the schema classes:
axis-name validation, channel names, points<->shapes conversion, table
region symmetry (reference ``models/_utils.py:69-104``,
``models/models.py:1345``, ``_core/operations/vectorize.py`` converse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference's SpatialElement union — every element in this engine
#: is a DataFrame (rasters as tile/long frames, shapes as WKB frames)
SpatialElement = DataFrame

VALID_AXES = ("c", "z", "y", "x")


def validate_axis_name(axis: str) -> None:
    """Reference ``models/_utils.py:69``: axis must be one of c/z/y/x."""
    if axis not in VALID_AXES:
        raise TypeError(f"Invalid axis: {axis}")


def validate_axes(axes: tuple[str, ...]) -> None:
    """Reference ``models/_utils.py:87``: all valid and no duplicates."""
    for a in axes:
        validate_axis_name(a)
    if len(axes) != len(set(axes)):
        raise ValueError("Axes must be unique.")


def get_channel_names(meta) -> list:
    """Channel names of a raster (reference ``models/_utils.py``
    ``get_channel_names``): explicit names if set on the
    :class:`~spatialdata_spark.operators.raster.RasterMeta`, else the
    0..c-1 default the reference assigns at parse time."""
    names = getattr(meta, "channel_names", None)
    if names:
        return list(names)
    return list(range(getattr(meta, "n_channels", 1)))


def set_channel_names(meta, names):
    """Raster meta with channel names set; length must match
    ``n_channels`` (reference raises on mismatch).  Metas are frozen
    here, so this returns a new meta (the reference mutates the
    xarray coords in place)."""
    import dataclasses

    names = list(names)
    n = getattr(meta, "n_channels", 1)
    if len(names) != n:
        raise ValueError(f"{len(names)} channel names for {n} channels")
    return dataclasses.replace(meta, channel_names=tuple(names))


def points_geopandas_to_dask_dataframe(shapes: DataFrame) -> DataFrame:
    """Reference ``models/_utils.py`` conversion, re-expressed on this
    engine's frames: a POINT-kind shapes frame (circle convention:
    bbox center is the point) becomes a points frame with
    ``x, y, instance_id`` columns.  Pure expressions, no shuffle."""
    return shapes.filter(F.col("kind") == "point").select(
        ((F.col("minx") + F.col("maxx")) / 2).alias("x"),
        ((F.col("miny") + F.col("maxy")) / 2).alias("y"),
        F.col("shape_id").alias("instance_id"),
        F.col("radius"),
    )


def points_dask_dataframe_to_geopandas(points: DataFrame, radius: float = 1.0) -> DataFrame:
    """Inverse conversion: a points frame becomes a POINT-kind shapes
    frame.  The 21-byte WKB point payload needs IEEE bit packing, so
    this is one Arrow pass (struct.pack per point, batched)."""
    from pyspark.sql import types as T

    id_col = "instance_id" if "instance_id" in points.columns else None
    base = points.select(
        (F.col(id_col) if id_col else F.monotonically_increasing_id()).alias("shape_id"),
        F.col("x"),
        F.col("y"),
    )
    schema = T.StructType(
        [
            T.StructField("shape_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("wkb", T.BinaryType()),
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType()),
            T.StructField("radius", T.DoubleType()),
        ]
    )
    r = float(radius)

    def gen(iterator):
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "shape_id": pdf["shape_id"].astype("int64"),
                    "kind": "point",
                    "wkb": [W.encode_point(float(x), float(y)) for x, y in zip(pdf["x"], pdf["y"])],
                    "minx": pdf["x"] - r,
                    "miny": pdf["y"] - r,
                    "maxx": pdf["x"] + r,
                    "maxy": pdf["y"] + r,
                    "radius": r,
                }
            )

    return base.mapInPandas(gen, schema)


def check_target_region_column_symmetry(table: DataFrame, region_key: str, target) -> None:
    """Reference ``models/models.py`` symmetry check: every value in
    ``table[region_key]`` must be one of the declared target region(s)
    and vice versa."""
    targets = set([target] if isinstance(target, str) else target)
    seen = {r[0] for r in table.select(region_key).distinct().collect()}
    if seen != targets:
        raise ValueError(
            f"region column {region_key!r} values {sorted(seen)} != declared regions {sorted(targets)}"
        )
