"""Canonical source readers (reference: _io/io_points.py:23-46,
io_shapes.py:33-67, io_table.py:22, io_zarr.py:125-235).

Each reader returns a schema-validated DataFrame; filters/column lists
passed here reach the parquet scan (predicate pushdown / column
pruning), which is the scale-path replacement for the reference's lazy
dask reads.  The full-container reader is ``SpatialDataset.read``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialdata_spark.models.schemas import get_model


def read_points(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate=None,
    coordinates: dict[str, str] | None = None,
) -> DataFrame:
    """Points from parquet; optional renames via ``coordinates``
    (PointsModel.parse), projection and filter pushed to the scan."""
    df = spark.read.parquet(path)
    df = get_model("points").parse(df, coordinates=coordinates)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_shapes(spark: SparkSession, path: str, predicate=None) -> DataFrame:
    """Shapes from parquet (WKB + denormalized bbox columns)."""
    df = spark.read.parquet(path)
    get_model("shapes").validate(df)
    if predicate is not None:
        df = df.filter(predicate)
    return df


def read_labels_long(spark: SparkSession, path: str, predicate=None) -> DataFrame:
    df = spark.read.parquet(path)
    get_model("labels").validate(df)
    if predicate is not None:
        df = df.filter(predicate)
    return df


def read_raster_tiles(spark: SparkSession, path: str, scale: int | None = None) -> DataFrame:
    """Tile-form raster; ``scale`` prunes pyramid levels at the scan."""
    df = spark.read.parquet(path)
    get_model("images").validate(df)
    if scale is not None:
        df = df.filter(F.col("scale") == scale)
    return df


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Event stream table.  Parquet TIMESTAMP(NANOS) columns are read as
    long (legacy flag) and truncated to microseconds — the same
    truncation DuckDB applies."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def read_events_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """Structured-Streaming variant of the events source."""
    return spark.readStream.schema(schema).parquet(path)
