"""Bucketed element storage: shuffle-free co-located joins.

The reference joins elements to annotation tables on
``(region, instance_id)`` constantly (relational_query.py:434-716).  At
100 TB the repeated shuffle of both sides dominates; Spark's answer is
bucketed tables — both sides pre-hash-partitioned (and sorted) on the
join key at write time, so every later equi-join on that key is a
zero-exchange sort-merge join between co-located buckets
(SURVEY.md §4: "Co-locate joins via bucketing").

``bucketBy`` requires the session catalog (``saveAsTable``); the data
itself stays ordinary parquet at ``path`` (external table), readable by
any engine — only the bucketing metadata lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 32,
    bucket_cols: list[str] | str = "instance_id",
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed (and sorted)
    on the join key.  ``buckets`` must match between the two sides of a
    co-located join."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *cols)
    )
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table — plans over it keep the bucket-distribution
    property, so joins/aggregations on the bucket key skip the exchange."""
    return spark.table(table)
