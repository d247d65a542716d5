"""3D (z-plane tile) raster layer tests — numpy dense volume is the
oracle.  Mirrors the reference's 3D raster query cases
(tests/core/query/test_spatial_query.py, Labels3DModel/Image3DModel)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialdata_spark.operators.raster import (
    RasterMeta,
    bounding_box_query_tiles_3d,
    long3d_to_tiles,
    map_tiles_3d,
    tiles3d_to_long,
)
from spatialdata_spark.operators.spatial_query import bounding_box_query_raster_long
from spatialdata_spark.transformations import Scale

NZ, H, W, TS = 5, 40, 60, 16


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(11)
    a = np.zeros((NZ, H, W))
    zz = rng.integers(0, NZ, 600)
    yy = rng.integers(0, H, 600)
    xx = rng.integers(0, W, 600)
    a[zz, yy, xx] = rng.integers(1, 100, 600).astype(float)
    return a


def _to_long_df(spark, a):
    zz, yy, xx = np.nonzero(a)
    rows = [(int(z), int(y), int(x), float(a[z, y, x])) for z, y, x in zip(zz, yy, xx)]
    return spark.createDataFrame(rows, ["z", "y", "x", "value"])


def _from_long(pdf):
    a = np.zeros((NZ, H, W))
    for r in pdf.itertuples():
        a[int(r.z), int(r.y), int(r.x)] = r.value
    return a


def test_pack_unpack_roundtrip(spark, volume):
    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    back = tiles3d_to_long(tiles, m).toPandas()
    np.testing.assert_allclose(_from_long(back), volume)


def test_bbox_query_3d(spark, volume):
    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    z0, y0, x0, z1, y1, x1 = 1, 5, 10, 4, 30, 50
    out = tiles3d_to_long(bounding_box_query_tiles_3d(tiles, m, z0, y0, x0, z1, y1, x1), m)
    got = _from_long(out.toPandas())
    exp = np.zeros_like(volume)
    exp[z0:z1, y0:y1, x0:x1] = volume[z0:z1, y0:y1, x0:x1]
    np.testing.assert_allclose(got, exp)


def test_z_prune_is_catalyst(spark, volume):
    """The z slice must be a pre-Python Catalyst filter on the tile
    table (pruning analog of z-chunked zarr slicing)."""
    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    out = bounding_box_query_tiles_3d(tiles, m, 2, 0, 0, 3, H, W)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "z" in plan and "Filter" in plan
    zs = {int(r.z) for r in out.select("z").distinct().collect()}
    assert zs <= {2}


def test_map_tiles_3d(spark, volume):
    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    out = tiles3d_to_long(map_tiles_3d(tiles, lambda a: a * 3.0, m), m).toPandas()
    np.testing.assert_allclose(_from_long(out), volume * 3.0)


def test_long_query_3d_scale(spark, volume):
    """bounding_box_query_raster_long with (z,y,x) axes under a Scale —
    the long-form path the sq_raster_3d oracle exercises."""
    df = _to_long_df(spark, volume)
    sc = Scale([2.0, 2.0, 2.0], ("z", "y", "x"))
    out = bounding_box_query_raster_long(
        df, ("z", "y", "x"), [2.0, 10.0, 20.0], [6.0, 40.0, 80.0], sc
    ).toPandas()
    # intrinsic inclusive bounds: z in [1,3], y in [5,20], x in [10,40]
    sub = volume[1:4, 5:21, 10:41]
    assert out["value"].sum() == pytest.approx(sub.sum())
    assert len(out) == int((sub != 0).sum())


@pytest.mark.parametrize("zarr_format,squeeze", [(2, True), (2, False), (3, True), (3, False)])
def test_zarr_3d_roundtrip(spark, tmp_path, volume, zarr_format, squeeze):
    """Volume -> zarr (z,y,x) / (c,z,y,x) chunks -> volume, v2 and v3."""
    from spatialdata_spark.sources.zarrio import read_zarr_tiles_3d, write_tiles3d_to_zarr

    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    p = str(tmp_path / f"vol_{zarr_format}_{squeeze}")
    n = write_tiles3d_to_zarr(
        tiles, m, p, compressor="zlib", squeeze_channel=squeeze, zarr_format=zarr_format
    )
    assert n > 0
    back_tiles, back_meta = read_zarr_tiles_3d(spark, p)
    assert back_meta.depth == NZ and back_meta.height == H and back_meta.width == W
    got = _from_long(tiles3d_to_long(back_tiles, back_meta).toPandas())
    np.testing.assert_allclose(got, volume)


def test_zarr_3d_over_http(spark, tmp_path, volume):
    """3D chunks fetched by executors over http (grid-enumerated keys)."""
    import functools
    import http.server
    import threading

    from spatialdata_spark.sources.zarrio import read_zarr_tiles_3d, write_tiles3d_to_zarr

    m = RasterMeta(height=H, width=W, tile=TS, depth=NZ)
    tiles = long3d_to_tiles(_to_long_df(spark, volume), m)
    p = str(tmp_path / "vol")
    write_tiles3d_to_zarr(tiles, m, p, compressor="zlib", squeeze_channel=True)
    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(tmp_path))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/vol"
        back_tiles, back_meta = read_zarr_tiles_3d(spark, url)
        got = _from_long(tiles3d_to_long(back_tiles, back_meta).toPandas())
        np.testing.assert_allclose(got, volume)
    finally:
        srv.shutdown()


def test_container_store_3d_roundtrip(spark, tmp_path, volume):
    """Labels3D through the container store: (z,y,x) zarr array with
    3-axis multiscales metadata, read back as long (z,y,x,label)."""
    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.sources.zarrio import read_zarr_store, write_zarr_store
    from spatialdata_spark.transformations import Scale as Sc

    labels_long = _to_long_df(spark, (volume > 0).astype(np.int64) * (volume % 7 + 1).astype(np.int64))
    labels_long = labels_long.select("z", "y", "x", F.col("value").cast("long").alias("label"))
    ds = SpatialDataset(spark)
    ds.add_labels("vol", labels_long, {"global": Sc([1.0, 1.0, 1.0], ("z", "y", "x"))})
    p = str(tmp_path / "store3d.zarr")
    m = RasterMeta(height=H, width=W, tile=TS, dtype="i8", depth=NZ)
    write_zarr_store(ds, p, raster_meta={"vol": m})

    import json, os
    ms = json.load(open(os.path.join(p, "labels", "vol", ".zattrs")))["multiscales"][0]
    assert [a["name"] for a in ms["axes"]] == ["z", "y", "x"]
    arr = json.load(open(os.path.join(p, "labels", "vol", "0", ".zarray")))
    assert arr["shape"] == [NZ, H, W] and arr["chunks"] == [1, TS, TS]

    back = read_zarr_store(spark, p)
    got = {(r["z"], r["y"], r["x"]): r["label"] for r in back.labels["vol"].collect()}
    exp_arr = (volume > 0).astype(np.int64) * (volume % 7 + 1).astype(np.int64)
    zz, yy, xx = np.nonzero(exp_arr)
    exp = {(int(z), int(y), int(x)): int(exp_arr[z, y, x]) for z, y, x in zip(zz, yy, xx)}
    assert got == exp
