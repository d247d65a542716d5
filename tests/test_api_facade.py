"""Reference-parity top-level API facade: every name a scverse user
drives the reference through resolves here and dispatches correctly on
the Spark data model (reference src/spatialdata/__init__.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import spatialdata_spark as S

REFERENCE_NAMES = [
    "SpatialData",
    "aggregate",
    "are_extents_equal",
    "bounding_box_query",
    "concatenate",
    "datasets",
    "deepcopy",
    "filter_by_table_query",
    "get_bounding_box_corners",
    "get_centroids",
    "get_element_annotators",
    "get_element_instances",
    "get_extent",
    "get_pyramid_levels",
    "get_values",
    "join_spatialelement_table",
    "map_raster",
    "match_element_to_table",
    "match_sdata_to_table",
    "match_table_to_element",
    "models",
    "polygon_query",
    "rasterize",
    "rasterize_bins",
    "read_zarr",
    "relabel_sequential",
    "sanitize_name",
    "sanitize_table",
    "to_circles",
    "to_polygons",
    "transform",
    "transformations",
    "unpad_raster",
]


def test_every_reference_name_resolves():
    missing = [n for n in REFERENCE_NAMES if not hasattr(S, n)]
    assert not missing, missing


@pytest.fixture()
def small_ds(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0], "y": [1.0, 2.0], "instance_id": [1, 2]})
    )
    tab = spark.createDataFrame(
        pd.DataFrame({"instance_id": [1], "region": ["pts"], "score": [9.0]})
    )
    ds = S.SpatialData(spark)
    ds.add_points("pts", pts, {"global": S.Identity()})
    ds.add_table("tab", tab, region="pts")
    return ds


def test_concatenate_with_suffixes(spark, small_ds):
    other = small_ds.deepcopy()
    out = S.concatenate([small_ds, other], region_suffixes=["_a", "_b"])
    assert sorted(out.points) == ["pts_a", "pts_b"]
    assert sorted(out.tables) == ["tab_a", "tab_b"]
    # table region values re-keyed to the renamed element
    assert out.tables["tab_a"].first()["region"] == "pts_a"
    assert out.table_meta["tab_a"].region == ["pts_a"]
    # name collision without suffixes is an error
    with pytest.raises(ValueError, match="already used"):
        S.concatenate([small_ds, other])


def test_match_sdata_to_table_and_annotators(spark, small_ds):
    assert S.get_element_annotators(small_ds, "pts") == ["tab"]
    out = S.match_sdata_to_table(small_ds, "tab")
    # element masked to the table's single instance
    assert [r["instance_id"] for r in out.points["pts"].collect()] == [1]


def test_get_centroids_dispatch(spark):
    labels = spark.createDataFrame(
        pd.DataFrame({"y": [0, 0, 2], "x": [0, 2, 2], "label": [5, 5, 0]})
    )
    got = {r["instance_id"]: (r["x"], r["y"]) for r in S.get_centroids(labels).collect()}
    assert got == {5: (1.0, 0.0)}
    pts = spark.createDataFrame(pd.DataFrame({"x": [1.0], "y": [2.0], "instance_id": [3]}))
    assert S.get_centroids(pts).first()["x"] == 1.0


def test_aggregate_dispatch_points_by_labels(spark):
    pts = spark.createDataFrame(pd.DataFrame({"x": [0.5, 0.6], "y": [0.5, 0.7]}))
    labels = spark.createDataFrame(pd.DataFrame({"y": [0], "x": [0], "label": [4]}))
    out = S.aggregate(pts, labels)
    assert {r["label"]: r["n"] for r in out.collect()} == {4: 2}


def test_transform_dispatch(spark):
    pts = spark.createDataFrame(pd.DataFrame({"x": [1.0], "y": [1.0]}))
    out = S.transform(pts, S.Scale([2.0, 3.0], ("x", "y"))).first()
    assert (out["x"], out["y"]) == (2.0, 3.0)


def test_extent_helpers(spark):
    pts = spark.createDataFrame(pd.DataFrame({"x": [0.0, 4.0], "y": [1.0, 5.0]}))
    e = S.get_extent(pts)
    assert e == {"x": (0.0, 4.0), "y": (1.0, 5.0)}
    assert S.are_extents_equal(e, {"x": (0.0, 4.0), "y": (1.0, 5.0)})
    assert not S.are_extents_equal(e, {"x": (0.0, 4.1), "y": (1.0, 5.0)})
    corners = S.get_bounding_box_corners(("x", "y"), [0, 0], [1, 2])
    assert corners.shape == (4, 2)
    assert {tuple(c) for c in corners.tolist()} == {(0, 0), (0, 2), (1, 0), (1, 2)}


def test_sanitize_table(spark):
    df = spark.createDataFrame(pd.DataFrame({"good": [1]})).withColumnRenamed("good", "bad name")
    out = S.sanitize_table(df)
    assert out.columns == [S.sanitize_name("bad name")]


def test_get_pyramid_levels():
    from spatialdata_spark.operators.raster import RasterMeta

    m = RasterMeta(height=100, width=60, tile=16)
    assert S.get_pyramid_levels(m, 3) == [(100, 60), (50, 30), (25, 15)]


def test_rasterize_bins_link_table_to_labels(spark, small_ds):
    labels = spark.createDataFrame(pd.DataFrame({"y": [0], "x": [0], "label": [1]}))
    small_ds.add_labels("bins", labels, {"global": S.Identity()})
    out = S.rasterize_bins_link_table_to_labels(small_ds, "tab", "bins")
    assert out.table_meta["tab"].region == ["bins"]
    assert out.tables["tab"].first()["region"] == "bins"
    with pytest.raises(ValueError, match="not in the dataset"):
        S.rasterize_bins_link_table_to_labels(small_ds, "tab", "missing")


def test_models_2d_3d_validation(spark):
    from spatialdata_spark import models as M

    l2 = spark.createDataFrame(pd.DataFrame({"y": [0], "x": [0], "label": [1]}))
    l3 = spark.createDataFrame(pd.DataFrame({"z": [0], "y": [0], "x": [0], "label": [1]}))
    M.Labels2DModel.validate(l2)
    M.Labels3DModel.validate(l3)
    with pytest.raises(ValueError, match="z column"):
        M.Labels2DModel.validate(l3)
    with pytest.raises(ValueError, match="z column"):
        M.Labels3DModel.validate(l2)
    assert M.get_axes_names(l3) == ("z", "y", "x")
    assert M.get_spatial_axes(("c", "z", "y", "x")) == ("z", "y", "x")
    M.validate_element(l2, "labels")


def test_get_table_keys_and_force_2d(spark, small_ds):
    assert S.get_table_keys(small_ds, "tab") == (["pts"], "region", "instance_id")
    pts3 = spark.createDataFrame(
        pd.DataFrame({"x": [1.0], "y": [2.0], "z": [3.0], "instance_id": [1]})
    )
    assert "z" not in S.force_2d(pts3).columns
    labels3 = spark.createDataFrame(
        pd.DataFrame({"z": [0, 1], "y": [5, 5], "x": [5, 5], "label": [2, 9]})
    )
    out = S.force_2d(labels3)
    assert out.count() == 1 and out.first()["label"] == 9
