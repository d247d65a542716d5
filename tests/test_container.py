"""Container persistence, ordered matching, rasterize_bins, and the
Structured-Streaming path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spatialdata_spark.catalog import SpatialDataset
from spatialdata_spark.operators.rasterize import rasterize_bins
from spatialdata_spark.operators.relational import match_table_to_element_ordered
from spatialdata_spark.operators.vectorize import circles_to_shapes
from spatialdata_spark.transformations import Scale, Translation


def _circles(spark):
    rows = [(i, float(i * 3 % 17), float(i * 5 % 13), 2.0) for i in range(1, 21)]
    return circles_to_shapes(spark.createDataFrame(rows, ["shape_id", "x", "y", "radius"]))


def test_store_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    ds = SpatialDataset(spark)
    ds.add_shapes("cells", _circles(spark), {"global": Scale([2.0, 2.0], ("x", "y"))})
    pts = spark.createDataFrame([(1.0, 2.0, 1), (3.0, 4.0, 2)], ["x", "y", "instance_id"])
    ds.add_points("transcripts", pts, {"global": Translation([1.0, -1.0], ("x", "y"))})
    table = spark.createDataFrame([("cells", 1, 0.5), ("cells", 2, 0.7)], ["region", "instance_id", "score"])
    ds.add_table("annotation", table, region="cells")
    ds.write(path)

    back = SpatialDataset.read(spark, path)
    assert sorted(back.element_names()) == ["annotation", "cells", "transcripts"]
    assert back["cells"].count() == 20
    assert back["transcripts"].count() == 2
    t = back.get_transformation("cells", "global")
    np.testing.assert_allclose(
        t.to_affine_matrix(("x", "y"), ("x", "y")),
        Scale([2.0, 2.0], ("x", "y")).to_affine_matrix(("x", "y"), ("x", "y")),
    )
    assert back.table_meta["annotation"].region == ["cells"]

    # partial read + element delete
    only_shapes = SpatialDataset.read(spark, path, selection=("shapes",))
    assert only_shapes.element_names() == ["cells"]
    back.delete_element_from_disk(path, "transcripts")
    again = SpatialDataset.read(spark, path)
    assert "transcripts" not in again.element_names()


def test_match_table_to_element_ordered(spark):
    el = _circles(spark)
    rows = [("cells", i, float(100 - i)) for i in range(1, 21)]
    table = spark.createDataFrame(rows, ["region", "instance_id", "v"])
    # element ordered by descending shape_id -> table must follow
    out = match_table_to_element_ordered(
        el.orderBy(F.desc("shape_id")), [F.desc("shape_id")], table, "cells"
    ).collect()
    got_ids = [r["instance_id"] for r in out]
    assert got_ids == list(range(20, 0, -1))
    assert [r["__element_pos"] for r in out] == list(range(1, 21))


def test_rasterize_bins_exact_affine(spark):
    obs = spark.createDataFrame(
        [(i, i % 7, i // 7, (i // 7) * 2.0 + 1.0, (i % 7) * 3.0 - 2.0) for i in range(30)],
        ["instance_id", "array_row", "array_col", "x", "y"],
    )
    x_long = spark.createDataFrame(
        [(i, "geneA", float(i)) for i in range(30)] + [(i, "geneB", 1.0) for i in range(30)],
        ["obs_id", "var_name", "value"],
    )
    out = {(r["py"], r["px"]): r["value"] for r in rasterize_bins(obs, x_long, "geneA").collect()}
    assert len(out) == 30
    for i in range(30):
        assert out[((i % 7) * 3 - 2, (i // 7) * 2 + 1)] == float(i)


def test_streaming_sessionize_stateful(spark, tmp_path):
    from spatialdata_spark.streaming.windows import streaming_sessionize_stateful

    src = str(tmp_path / "sess_stream")
    rows = [
        # user 10: two sessions separated by > 30 min, second still open
        ("2024-01-01 00:00:00", "click", 1.0, 1, 10),
        ("2024-01-01 00:10:00", "click", 1.0, 2, 10),
        ("2024-01-01 01:00:00", "view", 1.0, 3, 10),
        # user 11: one open session only -> nothing emitted
        ("2024-01-01 00:05:00", "click", 1.0, 4, 11),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value", "event_id", "user_id"]).select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value", "event_id", "user_id"
    )
    df.write.mode("overwrite").parquet(src)
    q = streaming_sessionize_stateful(spark, src, df.schema, gap_minutes=30)
    q.processAllAvailable()
    q.stop()
    got = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_stateful").collect()
    ]
    t0 = 1704067200  # 2024-01-01T00:00:00 UTC (session TZ pinned to UTC)
    assert got == [(10, t0, t0 + 600, 2)]


def test_streaming_tumbling(spark, tmp_path):
    from spatialdata_spark.streaming.windows import streaming_tumbling_query

    src = str(tmp_path / "events_stream")
    rows = [
        ("2024-01-01 00:05:00", "click", 1.0, 1, 10),
        ("2024-01-01 00:55:00", "click", 2.0, 2, 11),
        ("2024-01-01 01:10:00", "view", 3.0, 3, 12),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value", "event_id", "user_id"]).select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value", "event_id", "user_id"
    )
    df.write.mode("overwrite").parquet(src)
    q = streaming_tumbling_query(spark, src, df.schema)
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"].isoformat(), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM events_windowed").collect()
    }
    assert got == {("2024-01-01T00:00:00", "click"): 2, ("2024-01-01T01:00:00", "view"): 1}
