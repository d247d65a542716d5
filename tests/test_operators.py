"""Operator tests over a hand-checkable scene (mirrors the reference's
tests/conftest.py:425-521 adversarial query/aggregation fixture idea:
shapes fully inside / outside / intersecting the query region)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatialdata_spark.geometry import wkb as W
from spatialdata_spark.operators import aggregate as AG
from spatialdata_spark.operators import measures as M
from spatialdata_spark.operators import rasterize as R
from spatialdata_spark.operators import relational as REL
from spatialdata_spark.operators import spatial_query as SQ
from spatialdata_spark.operators import transform as TR
from spatialdata_spark.operators import vectorize as V
from spatialdata_spark.transformations import Affine, Identity, Scale, Sequence, Translation

XY = ("x", "y")


@pytest.fixture(scope="module")
def points(spark):
    # 10x10 grid at half-integer coordinates (0.5 .. 9.5)
    rows = [(float(i) + 0.5, float(j) + 0.5, i * 10 + j, "g1" if (i + j) % 2 == 0 else "g2")
            for i in range(10) for j in range(10)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y", "instance_id", "gene"]))


def _circle_row(sid, cx, cy, r):
    return (sid, "point", W.encode_point(cx, cy), cx - r, cy - r, cx + r, cy + r, r)


def _poly_row(sid, ring):
    ring = np.asarray(ring, dtype=float)
    return (
        sid, "polygon", W.encode_polygon([ring]),
        float(ring[:, 0].min()), float(ring[:, 1].min()),
        float(ring[:, 0].max()), float(ring[:, 1].max()), None,
    )


SHAPES_COLS = ["shape_id", "kind", "wkb", "minx", "miny", "maxx", "maxy", "radius"]


@pytest.fixture(scope="module")
def circles(spark):
    rows = [
        _circle_row(1, 2.0, 2.0, 1.6),   # covers points at dist<1.6 of (2,2)
        _circle_row(2, 8.0, 8.0, 1.0),
        _circle_row(3, 50.0, 50.0, 2.0),  # fully outside the grid
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=SHAPES_COLS))


@pytest.fixture(scope="module")
def polygons(spark):
    rows = [
        _poly_row(10, [[0, 0], [4, 0], [4, 4], [0, 4]]),       # square: 16 grid pts
        _poly_row(11, [[6, 6], [20, 6], [20, 20], [6, 20]]),   # clipped by grid edge
        _poly_row(12, [[100, 100], [101, 100], [101, 101], [100, 101]]),  # outside
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=SHAPES_COLS))


# ---------------- transform ----------------


def test_transform_points_scale_translate(spark, points):
    t = Sequence([Scale([2.0, 2.0], XY), Translation([10.0, -5.0], XY)])
    out = TR.transform_points(points, t).filter(F.col("instance_id") == 0).first()
    assert out["x"] == pytest.approx(0.5 * 2 + 10)
    assert out["y"] == pytest.approx(0.5 * 2 - 5)


def test_transform_points_rotation(spark, points):
    th = math.pi / 2
    rot = Affine([[math.cos(th), -math.sin(th), 0], [math.sin(th), math.cos(th), 0], [0, 0, 1]], XY, XY)
    out = TR.transform_points(points, rot).filter(F.col("instance_id") == 0).first()
    # (0.5, 0.5) rotated 90deg -> (-0.5, 0.5)
    assert out["x"] == pytest.approx(-0.5)
    assert out["y"] == pytest.approx(0.5)


def test_transform_points_no_udf_in_plan(points):
    t = Scale([2.0, 2.0], XY)
    plan = TR.transform_points(points, t)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transform_shapes_scale(circles):
    out = TR.transform_shapes(circles, Scale([2.0, 2.0], XY)).filter(F.col("shape_id") == 1).first()
    assert out["radius"] == pytest.approx(3.2)
    assert out["minx"] == pytest.approx((2.0 - 1.6) * 2)
    kind, xy = W.decode(bytes(out["wkb"]))
    assert kind == "point" and np.allclose(xy, [4.0, 4.0])


def test_transform_shapes_rotation_bbox(polygons):
    th = math.pi / 4
    rot = Affine([[math.cos(th), -math.sin(th), 0], [math.sin(th), math.cos(th), 0], [0, 0, 1]], XY, XY)
    out = TR.transform_shapes(polygons, rot).filter(F.col("shape_id") == 10).first()
    # square [0,4]^2 rotated 45deg: x in [-2*sqrt2, 2*sqrt2]... actually corners map to
    # (0,0),(2.83,2.83),(0,5.66),(-2.83,2.83)
    assert out["minx"] == pytest.approx(-4 / math.sqrt(2), abs=1e-6)
    assert out["maxx"] == pytest.approx(4 / math.sqrt(2), abs=1e-6)
    assert out["maxy"] == pytest.approx(4 * math.sqrt(2), abs=1e-6)


# ---------------- spatial query ----------------


def test_bbox_query_identity_exclusive_bounds(points):
    # box (1,1)-(3,3): strict bounds exclude x=1 or 3; half-integer grid ->
    # points 1.5, 2.5 in each axis -> 4 points
    out = SQ.bounding_box_query_points(points, XY, [1, 1], [3, 3])
    assert out.count() == 4
    # boundary exclusivity: box edges on point coords exclude them ->
    # only (1.5, 1.5) survives 0.5 < x,y < 2.5
    out2 = SQ.bounding_box_query_points(points, XY, [0.5, 0.5], [2.5, 2.5])
    assert out2.count() == 1


def test_bbox_query_identity_bounds_precise(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [0.5, 1.5, 2.5], "y": [0.5, 1.5, 2.5]}))
    out = SQ.bounding_box_query_points(df, XY, [0.5, 0.5], [2.5, 2.5])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["x"] == 1.5


def test_bbox_query_scale_fast_path(points):
    # scale x2: target box (2,2)-(6,6) = intrinsic (1,1)-(3,3) -> 4 points
    out = SQ.bounding_box_query_points(points, XY, [2, 2], [6, 6], Scale([2.0, 2.0], XY))
    assert out.count() == 4


def test_bbox_query_pushdown_in_plan(points, spark, tmp_path):
    # written to parquet, the identity fast path must push the range filter
    p = str(tmp_path / "pts.parquet")
    points.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = SQ.bounding_box_query_points(df, XY, [1, 1], [3, 3])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(x,1.0)" in plan


def test_bbox_query_rotation_general_path(spark):
    th = math.pi / 4
    rot = Affine([[math.cos(th), -math.sin(th), 0], [math.sin(th), math.cos(th), 0], [0, 0, 1]], XY, XY)
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 10.0], "y": [0.0, 0.0]}))
    # target coords of (1,0) = (0.707, 0.707); box around it
    out = SQ.bounding_box_query_points(df, XY, [0.5, 0.5], [1.0, 1.0], rot)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["x"] == 1.0


def test_multibox_query(points):
    out = SQ.bounding_box_query_multibox(points, XY, [[0, 0], [5, 5]], [[2, 2], [7, 7]])
    counts = {r["box_id"]: r["n"] for r in out.groupBy("box_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 4, 1: 4}


def test_polygon_query_points_triangle(spark, points):
    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    out = SQ.polygon_query_points(points, tri)
    got = {(r["x"], r["y"]) for r in out.collect()}
    expect = {(i + 0.5, j + 0.5) for i in range(4) for j in range(4) if (i + 0.5) + (j + 0.5) < 4.0}
    assert got == expect


def test_bbox_query_shapes_circles(circles):
    # box (0,0)-(4,4) touches circle 1 (center 2,2) only
    out = SQ.bounding_box_query_shapes(circles, XY, [0, 0], [4, 4])
    assert [r["shape_id"] for r in out.collect()] == [1]
    # box far away -> none
    assert SQ.bounding_box_query_shapes(circles, XY, [200, 200], [300, 300]).count() == 0
    # circle-vs-box exact test: box corner misses circle though bboxes overlap
    out2 = SQ.bounding_box_query_shapes(circles, XY, [3.2, 3.2], [4, 4])
    assert out2.count() == 0  # (3.2,3.2) is 1.7 from (2,2) > 1.6


def test_bbox_query_shapes_polygons(polygons):
    out = SQ.bounding_box_query_shapes(polygons, XY, [3, 3], [7, 7])
    got = sorted(r["shape_id"] for r in out.collect())
    assert got == [10, 11]


def test_polygon_query_shapes(polygons):
    tri = np.array([[5.0, 5.0], [7.0, 5.0], [7.0, 7.0]])
    out = SQ.polygon_query_shapes(polygons, tri)
    got = sorted(r["shape_id"] for r in out.collect())
    assert got == [11]


# ---------------- relational joins ----------------


@pytest.fixture(scope="module")
def table(spark):
    rows = [("cells", i, f"type_{i % 3}", float(i)) for i in [1, 2, 5, 7]]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["region", "instance_id", "celltype", "score"]))


def test_join_left(circles, table):
    el, tb = REL.join_element_table(circles, "cells", "shapes", table, how="left")
    assert el.count() == 3  # element untouched
    assert sorted(r["instance_id"] for r in tb.collect()) == [1, 2]


def test_join_inner(circles, table):
    el, tb = REL.join_element_table(circles, "cells", "shapes", table, how="inner")
    assert sorted(r["shape_id"] for r in el.collect()) == [1, 2]
    assert sorted(r["instance_id"] for r in tb.collect()) == [1, 2]


def test_join_right(circles, table):
    el, tb = REL.join_element_table(circles, "cells", "shapes", table, how="right")
    assert sorted(r["shape_id"] for r in el.collect()) == [1, 2]
    assert tb.count() == 4


def test_join_left_exclusive(circles, table):
    el, tb = REL.join_element_table(circles, "cells", "shapes", table, how="left_exclusive")
    assert sorted(r["shape_id"] for r in el.collect()) == [3]
    assert tb is None


def test_join_right_exclusive(circles, table):
    el, tb = REL.join_element_table(circles, "cells", "shapes", table, how="right_exclusive")
    assert el is None
    assert sorted(r["instance_id"] for r in tb.collect()) == [5, 7]


def test_filter_labels_by_table(spark, table):
    rows = [(y, x, lab) for lab, (y, x) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)], start=1)]
    labels = spark.createDataFrame(pd.DataFrame(rows, columns=["y", "x", "label"]))
    out = REL.filter_labels_by_table(labels, table, "cells")
    kept = {r["label"] for r in out.collect()}
    assert kept == {0, 1, 2}  # labels 3,4 zeroed


def test_get_values_from_table(circles, table):
    out = REL.get_values("score", element_df=None, table_df=table, region="cells")
    assert {r["instance_id"]: r["value"] for r in out.collect()} == {1: 1.0, 2: 2.0, 5: 5.0, 7: 7.0}


def test_get_values_from_x_long(spark):
    x_long = spark.createDataFrame(
        pd.DataFrame({"obs_id": [1, 1, 2], "var_name": ["geneA", "geneB", "geneA"], "value": [1.0, 2.0, 3.0]})
    )
    out = REL.get_values("geneA", x_long=x_long)
    assert {r["instance_id"]: r["value"] for r in out.collect()} == {1: 1.0, 2: 3.0}


def test_get_values_from_obsm(spark):
    obsm = spark.createDataFrame(
        pd.DataFrame(
            {
                "obs_id": [1, 1, 2, 2, 1],
                "key": ["spatial", "spatial", "spatial", "spatial", "X_pca"],
                "dim": [0, 1, 0, 1, 0],
                "value": [10.0, 20.0, 30.0, 40.0, 9.0],
            }
        )
    )
    out = REL.get_values("spatial", obsm_long=obsm, obsm_ndim=2)
    assert set(out.columns) == {"instance_id", "spatial_0", "spatial_1"}
    got = {r["instance_id"]: (r["spatial_0"], r["spatial_1"]) for r in out.collect()}
    assert got == {1: (10.0, 20.0), 2: (30.0, 40.0)}
    # without ndim hint: dims discovered
    out2 = REL.get_values("X_pca", obsm_long=obsm)
    assert {r["instance_id"]: r["X_pca_0"] for r in out2.collect()} == {1: 9.0}
    with pytest.raises(KeyError):
        REL.get_values("missing", obsm_long=obsm)


def test_get_values_prefers_x_over_obsm(spark):
    x_long = spark.createDataFrame(
        pd.DataFrame({"obs_id": [1], "var_name": ["spatial"], "value": [5.0]})
    )
    obsm = spark.createDataFrame(
        pd.DataFrame({"obs_id": [1], "key": ["spatial"], "dim": [0], "value": [99.0]})
    )
    out = REL.get_values("spatial", x_long=x_long, obsm_long=obsm)
    assert out.collect()[0]["value"] == 5.0


def test_filter_table_by_var(spark):
    x_long = spark.createDataFrame(
        pd.DataFrame(
            {"obs_id": [1, 1, 2], "var_name": ["a", "b", "a"], "value": [1.0, 2.0, 3.0]}
        )
    )
    var_df = spark.createDataFrame(
        pd.DataFrame({"var_name": ["a", "b"], "weight": [0.1, 0.9]})
    )
    out = REL.filter_table_by_var_predicate(x_long, var_df, F.col("weight") > 0.5)
    assert {(r["obs_id"], r["var_name"]) for r in out.collect()} == {(1, "b")}
    out2 = REL.filter_table_by_var_names(x_long, ["a"])
    assert out2.count() == 2


# ---------------- aggregation ----------------


def test_aggregate_points_by_circles_count(points, circles):
    out = AG.aggregate_points_by_shapes(points, circles)
    got = {r["by_id"]: r["n"] for r in out.collect()}
    # circle 1: center (2,2) r=1.6 over half-integer grid: dist<=1.6
    expect1 = sum(
        1 for i in range(10) for j in range(10)
        if (i + 0.5 - 2) ** 2 + (j + 0.5 - 2) ** 2 <= 1.6**2
    )
    expect2 = sum(
        1 for i in range(10) for j in range(10)
        if (i + 0.5 - 8) ** 2 + (j + 0.5 - 8) ** 2 <= 1.0
    )
    assert got.get(1) == expect1
    assert got.get(2) == expect2
    assert 3 not in got


def test_aggregate_points_by_polygons_count(points, polygons):
    out = AG.aggregate_points_by_shapes(points, polygons)
    got = {r["by_id"]: r["n"] for r in out.collect()}
    assert got.get(10) == 16  # 4x4 interior points
    assert got.get(11) == 16  # (6..9.5)x(6..9.5): 4x4
    assert 12 not in got


def test_aggregate_points_categorical(points, polygons):
    out = AG.aggregate_points_by_shapes(points, polygons, value_col="gene")
    got = {(r["by_id"], r["category"]): r["n"] for r in out.collect()}
    assert got[(10, "g1")] + got[(10, "g2")] == 16
    assert got[(10, "g1")] == 8


def test_aggregate_points_sum(points, circles):
    out = AG.aggregate_points_by_shapes(points, circles, value_col="instance_id", agg_func="sum")
    row = {r["by_id"]: r["sum_instance_id"] for r in out.collect()}
    expect1 = sum(
        i * 10 + j for i in range(10) for j in range(10)
        if (i + 0.5 - 2) ** 2 + (j + 0.5 - 2) ** 2 <= 1.6**2
    )
    assert row[1] == expect1


def test_aggregate_shapes_by_shapes_fractions(spark):
    # unit squares as values; one big box as region covering half of each
    values = spark.createDataFrame(pd.DataFrame(
        [_poly_row(1, [[0, 0], [2, 0], [2, 2], [0, 2]]),
         _poly_row(2, [[3, 0], [5, 0], [5, 2], [3, 2]])], columns=SHAPES_COLS))
    by = spark.createDataFrame(pd.DataFrame(
        [_poly_row(100, [[1, 0], [4, 0], [4, 2], [1, 2]])], columns=SHAPES_COLS))
    out = AG.aggregate_shapes_by_shapes(values, by, fractions=True)
    row = out.collect()[0]
    # v1 area 4, overlap [1,2]x[0,2]=2 -> 0.5 ; v2 area 4, overlap [3,4]x[0,2]=2 -> 0.5
    assert row["by_id"] == 100 and row["n"] == pytest.approx(1.0)


def test_aggregate_image_by_labels(spark):
    img = spark.createDataFrame(pd.DataFrame(
        [(0, y, x, float(x + y)) for y in range(4) for x in range(4)], columns=["c", "y", "x", "value"]))
    labels = spark.createDataFrame(pd.DataFrame(
        [(y, x, 1 if x < 2 else 2) for y in range(4) for x in range(4)], columns=["y", "x", "label"]))
    out = AG.aggregate_image_by_labels(img, labels, "mean")
    got = {(r["label"], r["c"]): r["mean_value"] for r in out.collect()}
    assert got[(1, 0)] == pytest.approx(np.mean([x + y for y in range(4) for x in range(4) if x < 2]))
    assert got[(2, 0)] == pytest.approx(np.mean([x + y for y in range(4) for x in range(4) if x >= 2]))


# ---------------- measures / rasterize / vectorize ----------------


def test_centroids_labels(spark):
    labels = spark.createDataFrame(pd.DataFrame(
        [(0, 0, 1), (0, 2, 1), (5, 5, 2), (0, 0, 0)], columns=["y", "x", "label"]))
    out = M.centroids_labels(labels)
    got = {r["instance_id"]: (r["x"], r["y"]) for r in out.collect()}
    assert got == {1: (1.0, 0.0), 2: (5.0, 5.0)}


def test_centroids_shapes(circles, polygons):
    got = {r["instance_id"]: (r["x"], r["y"]) for r in M.centroids_shapes(circles).collect()}
    assert got[1] == (2.0, 2.0)
    got_p = {r["instance_id"]: (r["x"], r["y"]) for r in M.centroids_shapes(polygons).collect()}
    assert got_p[10] == (2.0, 2.0)


def test_extent(points, circles):
    ext = M.extent_points(points)
    assert ext["x"] == (0.5, 9.5) and ext["y"] == (0.5, 9.5)
    ext_s = M.extent_shapes(circles)
    assert ext_s["x"] == (0.4000000000000001, 52.0) or ext_s["x"][1] == 52.0


def test_extent_corners_transform(points):
    ext = M.extent_points(points)
    out = M.transformed_bbox_corners(ext, Scale([2.0, 2.0], XY))
    assert out["x"] == (1.0, 19.0)


def test_rasterize_points_count(points):
    out = R.rasterize_points(points, 0.0, 0.0, 5.0)
    got = {(r["py"], r["px"]): r["value"] for r in out.collect()}
    assert got == {(0, 0): 25, (0, 1): 25, (1, 0): 25, (1, 1): 25}


def test_rasterize_categorical(points):
    out = R.rasterize_points_categorical(points, 0.0, 0.0, 10.0, "gene")
    got = {r["category"]: r["n"] for r in out.collect()}
    assert got == {"g1": 50, "g2": 50}


def test_relabel_sequential(spark):
    labels = spark.createDataFrame(pd.DataFrame(
        [(0, 0, 7), (0, 1, 42), (1, 0, 7), (1, 1, 0)], columns=["y", "x", "label"]))
    out = R.relabel_sequential(labels)
    got = sorted({r["label"] for r in out.collect()})
    assert got == [0, 1, 2]


def test_labels_to_circles(spark):
    # 2x2 block of label 1 -> area 4 -> radius sqrt(4/pi)
    labels = spark.createDataFrame(pd.DataFrame(
        [(y, x, 1) for y in range(2) for x in range(2)], columns=["y", "x", "label"]))
    row = V.labels_to_circles(labels).first()
    assert row["radius"] == pytest.approx(math.sqrt(4 / math.pi))
    assert (row["x"], row["y"]) == (0.5, 0.5)


def test_shapes_to_circles(polygons):
    out = {r["shape_id"]: r for r in V.shapes_to_circles(polygons).collect()}
    assert out[10]["radius"] == pytest.approx(math.sqrt(16 / math.pi))


def test_labels_to_polygons_roundtrip(spark):
    labels = spark.createDataFrame(pd.DataFrame(
        [(y, x, 1) for y in range(3) for x in range(3)], columns=["y", "x", "label"]))
    row = V.labels_to_polygons(labels).first()
    kind, rings = W.decode(bytes(row["wkb"]))
    assert kind == "polygon"
    from spatialdata_spark.geometry import predicates as P

    assert P.polygon_area(rings) == pytest.approx(9.0)


def test_spatial_query_rejects_singular_transform(spark):
    import pytest

    from spatialdata_spark.operators.spatial_query import bounding_box_query_points
    from spatialdata_spark.transformations import Affine

    pts = spark.createDataFrame([(1.0, 2.0)], ["x", "y"])
    singular = Affine([[1, 0, 0], [1, 0, 0], [0, 0, 1]], ("x", "y"), ("x", "y"))
    with pytest.raises(ValueError, match="singular"):
        bounding_box_query_points(pts, ("x", "y"), [0, 0], [10, 10], singular)


def test_aggregate_points_by_labels(spark):
    from spatialdata_spark.operators.aggregate import aggregate_points_by_labels

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "x": [0.2, 0.9, 1.5, 1.1, 2.7, 5.0],
                "y": [0.5, 0.4, 0.0, 0.9, 2.2, 5.0],
                "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            }
        )
    )
    # labels: pixel (0,0)->7, (0,1)->7, (2,2)->9; pixel (5,5) unlabeled
    labels = spark.createDataFrame(
        pd.DataFrame({"y": [0, 0, 2], "x": [0, 1, 2], "label": [7, 7, 9]})
    )
    out = aggregate_points_by_labels(pts, labels, value_col="v", agg_func="sum")
    got = {r["label"]: (r["n"], r["sum_value"]) for r in out.collect()}
    assert got == {7: (4, 10.0), 9: (1, 5.0)}
    # count-only path and background-0 drop
    labels0 = spark.createDataFrame(pd.DataFrame({"y": [5], "x": [5], "label": [0]}))
    out2 = aggregate_points_by_labels(pts, labels.union(labels0))
    assert {r["label"] for r in out2.collect()} == {7, 9}
    # plan stays JVM-side: no Python boundary anywhere
    assert "mapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
