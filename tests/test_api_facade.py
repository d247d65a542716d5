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


# the complete __all__ of each reference public module (reference
# src/spatialdata/{__init__,transformations/__init__,models/__init__,
# datasets,dataloader/__init__}.py) — every name must resolve here
FULL_SURFACE = {
    "top": ['deepcopy', 'sanitize_name', 'sanitize_table', 'get_centroids', 'concatenate',
            'are_extents_equal', 'get_extent', 'aggregate', 'map_raster', 'relabel_sequential',
            'rasterize', 'rasterize_bins', 'rasterize_bins_link_table_to_labels', 'transform',
            'to_circles', 'to_polygons', 'get_bounding_box_corners', 'filter_by_table_query',
            'get_element_annotators', 'get_element_instances', 'get_values',
            'join_spatialelement_table', 'match_element_to_table', 'match_sdata_to_table',
            'match_table_to_element', 'bounding_box_query', 'polygon_query', 'SpatialData',
            'get_dask_backing_files', 'SpatialDataFormatType', 'read_zarr',
            'disable_dask_tune_optimization', 'get_pyramid_levels', 'unpad_raster', 'settings'],
    "transformations": ['BaseTransformation', 'Identity', 'MapAxis', 'Translation', 'Scale',
                        'Affine', 'Sequence', 'get_transformation', 'set_transformation',
                        'remove_transformation', 'get_transformation_between_coordinate_systems',
                        'get_transformation_between_landmarks', 'align_elements_using_landmarks',
                        'remove_transformations_to_coordinate_system'],
    "models": ['Labels2DModel', 'Labels3DModel', 'Image2DModel', 'Image3DModel', 'ShapesModel',
               'PointsModel', 'TableModel', 'get_model', 'SpatialElement', 'get_spatial_axes',
               'validate_axes', 'validate_axis_name', 'X', 'Y', 'Z', 'C', 'get_axes_names',
               'points_geopandas_to_dask_dataframe', 'points_dask_dataframe_to_geopandas',
               'check_target_region_column_symmetry', 'get_table_keys', 'validate_element',
               'get_channel_names', 'set_channel_names', 'force_2d'],
    "datasets": ['blobs', 'raccoon'],
    "dataloader": ['ImageTilesDataset'],
}


def test_full_reference_surface_resolves():
    import spatialdata_spark.dataloader as DL
    import spatialdata_spark.datasets as DS
    import spatialdata_spark.models as M
    import spatialdata_spark.transformations as T

    mods = {"top": S, "transformations": T, "models": M, "datasets": DS, "dataloader": DL}
    missing = {
        g: [n for n in nl if not hasattr(mods[g], n)] for g, nl in FULL_SURFACE.items()
    }
    missing = {g: m for g, m in missing.items() if m}
    assert not missing, missing


def test_transformation_accessors(spark, small_ds):
    import spatialdata_spark.transformations as T

    t = T.get_transformation(small_ds, "pts", "global")
    assert isinstance(t, S.Identity)
    T.set_transformation(small_ds, "pts", S.Scale([2.0, 2.0], ("x", "y")), "rotated")
    assert set(T.get_transformation(small_ds, "pts", get_all=True)) == {"global", "rotated"}
    # cross-CS resolution: rotated -> element -> global
    comp = T.get_transformation_between_coordinate_systems(small_ds, "rotated", "global")
    mat = comp.to_affine_matrix(("x", "y"), ("x", "y"))
    assert abs(mat[0, 0] - 0.5) < 1e-12  # inverse(scale 2) then identity
    T.remove_transformation(small_ds, "pts", "rotated")
    with pytest.raises(ValueError):
        T.remove_transformation(small_ds, "pts", "rotated")
    T.set_transformation(small_ds, "pts", S.Scale([2.0, 2.0], ("x", "y")), "doomed")
    T.remove_transformations_to_coordinate_system(small_ds, "doomed")
    assert "doomed" not in T.get_transformation(small_ds, "pts", get_all=True)


def test_points_shapes_conversions(spark):
    import spatialdata_spark.models as M

    pts = spark.createDataFrame(
        pd.DataFrame({"x": [1.5, -2.0], "y": [3.0, 0.25], "instance_id": [7, 8]})
    )
    shapes = M.points_dask_dataframe_to_geopandas(pts, radius=2.0)
    rows = {r["shape_id"]: r for r in shapes.collect()}
    assert rows[7]["kind"] == "point" and rows[7]["radius"] == 2.0
    assert rows[7]["minx"] == -0.5 and rows[7]["maxx"] == 3.5
    from spatialdata_spark.geometry import wkb as W

    kind, (x, y) = W.decode(bytes(rows[8]["wkb"]))
    assert kind == "point" and (x, y) == (-2.0, 0.25)
    back = M.points_geopandas_to_dask_dataframe(shapes)
    got = {r["instance_id"]: (r["x"], r["y"]) for r in back.collect()}
    assert got == {7: (1.5, 3.0), 8: (-2.0, 0.25)}


def test_channel_names_and_axis_validation():
    import spatialdata_spark.models as M
    from spatialdata_spark.operators.raster import RasterMeta

    meta = RasterMeta(height=4, width=4, n_channels=3)
    assert M.get_channel_names(meta) == [0, 1, 2]
    meta = M.set_channel_names(meta, ["r", "g", "b"])
    assert M.get_channel_names(meta) == ["r", "g", "b"]
    with pytest.raises(ValueError):
        M.set_channel_names(meta, ["just-one"])
    M.validate_axes(("c", "y", "x"))
    with pytest.raises(TypeError):
        M.validate_axis_name("t")
    with pytest.raises(ValueError):
        M.validate_axes(("y", "y"))


def test_settings_and_backing_files(spark):
    assert S.settings.shapes_geometry_encoding == "WKB"
    assert S.settings.dask_tune_optimization in (True, False)
    S.disable_dask_tune_optimization()
    assert S.settings.dask_tune_optimization is False
    S.settings.dask_tune_optimization = True
    df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    files = S.get_dask_backing_files(df)
    assert files and all("region.parquet" in f for f in files)
    assert S.SpatialDataFormatType is str


def test_region_column_symmetry(spark):
    import spatialdata_spark.models as M

    tab = spark.createDataFrame(pd.DataFrame({"region": ["a", "a", "b"], "v": [1, 2, 3]}))
    M.check_target_region_column_symmetry(tab, "region", ["a", "b"])
    with pytest.raises(ValueError):
        M.check_target_region_column_symmetry(tab, "region", "a")
