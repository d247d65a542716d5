"""labels_tiles_to_polygons: the oracle is the point-in-polygon
round trip — every pixel center must be classified exactly as the
original label mask says, including holes, multiple components, and
checkerboard corner contacts spanning tile boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from spatialdata_spark.geometry import predicates as P
from spatialdata_spark.geometry import wkb as W
from spatialdata_spark.operators.raster import RasterMeta, long_to_tiles
from spatialdata_spark.operators.vectorize import labels_tiles_to_polygons

H, W_, TS = 40, 40, 16


@pytest.fixture(scope="module")
def labels():
    a = np.zeros((H, W_), dtype=np.int64)
    a[2:10, 2:12] = 1          # plain rectangle
    a[14:30, 5:25] = 2         # big block ...
    a[18:26, 10:20] = 0        # ... with a hole
    a[18:26, 12:18] = 3        # island inside the hole
    a[32:36, 2:6] = 4          # two components, same label
    a[32:36, 8:12] = 4
    a[36, 6] = 4               # plus a single pixel
    a[5, 30] = 5               # checkerboard corner contact
    a[6, 31] = 5
    a[5, 31] = 6
    a[6, 30] = 6
    a[12:20, 28:36] = 7        # crosses the tile boundary at y=16, x=32
    return a


@pytest.fixture(scope="module")
def shapes(spark, labels):
    yy, xx = np.nonzero(labels)
    df = spark.createDataFrame(
        [(int(y), int(x), int(labels[y, x])) for y, x in zip(yy, xx)], ["y", "x", "value"]
    )
    meta = RasterMeta(height=H, width=W_, tile=TS, dtype="i8")
    tiles = long_to_tiles(df, meta)
    return {r["shape_id"]: r for r in labels_tiles_to_polygons(tiles, meta).collect()}


def _pip(buf, px, py):
    kind, geom = W.decode(bytes(buf))
    if kind == "polygon":
        return P.points_in_polygon(px, py, geom)
    return P.points_in_multipolygon(px, py, geom)


def test_all_labels_present(shapes, labels):
    assert set(shapes) == set(np.unique(labels)) - {0}


def test_round_trip_pixel_membership(shapes, labels):
    yy, xx = np.mgrid[0:H, 0:W_]
    px = xx.ravel() + 0.5
    py = yy.ravel() + 0.5
    for lab, row in shapes.items():
        want = (labels == lab).ravel()
        got = _pip(row["wkb"], px, py)
        assert np.array_equal(got, want), f"label {lab} mask mismatch"


def test_area_equals_pixel_count(shapes, labels):
    for lab, row in shapes.items():
        kind, geom = W.decode(bytes(row["wkb"]))
        area = P.polygon_area(geom) if kind == "polygon" else P.multipolygon_area(geom)
        assert area == (labels == lab).sum(), f"label {lab}"


def test_bbox(shapes, labels):
    for lab, row in shapes.items():
        yy, xx = np.nonzero(labels == lab)
        assert (row["minx"], row["miny"], row["maxx"], row["maxy"]) == (
            xx.min(),
            yy.min(),
            xx.max() + 1,
            yy.max() + 1,
        )


def test_multi_component_is_multipolygon(shapes):
    assert shapes[4]["kind"] == "multipolygon"
    _, polys = W.decode(bytes(shapes[4]["wkb"]))
    assert len(polys) == 3
