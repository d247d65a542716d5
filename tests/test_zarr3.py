"""Zarr v3 (container format V02) tests — format matrix parity with the
reference's V01<->zarr v2 / V02<->zarr v3 pairing (_io/format.py:56-267)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from spatialdata_spark.operators.raster import RasterMeta, tiles_to_long
from spatialdata_spark.sources.zarr3 import (
    array_meta,
    codec_of_chain,
    parse_array_meta,
)
from spatialdata_spark.sources.zarrio import (
    read_zarr_store,
    read_zarr_tiles,
    write_zarr_store,
    zarr_read_array,
    zarr_write_array,
)


@pytest.mark.parametrize("codec", [None, "zlib", "gzip", "blosc"])
def test_v3_array_roundtrip_codecs(tmp_path, codec):
    a = np.arange(120, dtype=np.float64).reshape(10, 12)
    p = str(tmp_path / "a")
    zarr_write_array(p, a, chunks=(4, 5), compressor=codec, zarr_format=3)
    doc = json.load(open(os.path.join(p, "zarr.json")))
    assert doc["zarr_format"] == 3 and doc["node_type"] == "array"
    np.testing.assert_array_equal(zarr_read_array(p), a)


def test_v3_chunk_keys_are_c_prefixed(tmp_path):
    a = np.ones((8, 8), dtype=np.int64)
    p = str(tmp_path / "a")
    zarr_write_array(p, a, chunks=(4, 4), compressor=None, zarr_format=3)
    assert os.path.exists(os.path.join(p, "c", "0", "0"))
    assert os.path.exists(os.path.join(p, "c", "1", "1"))


def test_v3_meta_parse_rejects_unknown():
    # zstd is now a supported standalone v3 codec (sources/zstd.py)
    assert codec_of_chain([{"name": "bytes"}, {"name": "zstd", "configuration": {}}]) == "zstd"
    with pytest.raises(ValueError, match="lzma"):
        codec_of_chain([{"name": "bytes"}, {"name": "lzma", "configuration": {}}])
    with pytest.raises(ValueError, match="chunk_grid"):
        parse_array_meta(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [4],
                "data_type": "int64",
                "chunk_grid": {"name": "rectangular"},
            }
        )
    m = array_meta((4, 4), (2, 2), np.dtype("<f8"), "zlib")
    assert parse_array_meta(m)["codec"] == "gzip"


def test_v3_tiles_distributed(spark, tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 50, size=(40, 48)).astype(np.float64)
    p = str(tmp_path / "img")
    zarr_write_array(p, a, chunks=(16, 16), compressor="zlib", zarr_format=3)
    tiles, meta = read_zarr_tiles(spark, p)
    got = np.zeros_like(a)
    for r in tiles_to_long(tiles, meta).collect():
        got[r["y"], r["x"]] = r["value"]
    np.testing.assert_array_equal(got, a)


def test_v3_container_roundtrip(spark, tmp_path):
    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.transformations import Scale

    pts = spark.createDataFrame(
        [(i, float(i), float(3 * i)) for i in range(12)], "id long, x double, y double"
    )
    labels = spark.createDataFrame(
        [(y, x, (y * 3 + x) % 4 + 1) for y in range(20) for x in range(20)],
        "y long, x long, label long",
    )
    ds = SpatialDataset(spark)
    ds.add_points("pts", pts, {"global": Scale([2.0, 0.5], ("x", "y"))})
    ds.add_labels("cells", labels, {"global": Scale([1.0, 1.0], ("y", "x"))})
    p = str(tmp_path / "store3.zarr")
    write_zarr_store(
        ds,
        p,
        raster_meta={"cells": RasterMeta(height=20, width=20, tile=16, dtype="i8")},
        zarr_format=3,
    )
    # v3 surface: zarr.json everywhere, no v2 documents
    root = json.load(open(os.path.join(p, "zarr.json")))
    assert root["node_type"] == "group"
    assert root["attributes"]["spatialdata_attrs"]["version"] == "0.2"
    assert not os.path.exists(os.path.join(p, ".zgroup"))
    assert json.load(open(os.path.join(p, "labels", "cells", "0", "zarr.json")))["node_type"] == "array"

    back = read_zarr_store(spark, p)
    assert sorted(r["id"] for r in back.points["pts"].collect()) == list(range(12))
    got = {(r["y"], r["x"]): r["label"] for r in back.labels["cells"].collect()}
    assert got == {(y, x): (y * 3 + x) % 4 + 1 for y in range(20) for x in range(20)}
    m = back.get_transformation("pts", "global").to_affine_matrix(("x", "y"), ("x", "y"))
    assert np.allclose(m, np.diag([2.0, 0.5, 1.0]))


def test_v3_container_over_http(spark, tmp_path):
    """v3 store read through the no-listing http fetcher: hierarchy via
    consolidated metadata (which indexes zarr.json documents)."""
    import functools
    import http.server
    import threading

    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.transformations import Identity

    pts = spark.createDataFrame([(1, 2.0, 3.0), (2, 4.0, 5.0)], "id long, x double, y double")
    ds = SpatialDataset(spark).add_points("pts", pts, {"global": Identity()})
    p = str(tmp_path / "store3.zarr")
    write_zarr_store(ds, p, zarr_format=3)

    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=str(tmp_path))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/store3.zarr"
        back = read_zarr_store(spark, url)
        assert sorted(r["id"] for r in back.points["pts"].collect()) == [1, 2]
    finally:
        srv.shutdown()
