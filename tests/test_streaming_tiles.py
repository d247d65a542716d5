"""Streaming zarr-chunk ingest: chunks written in two waves (a running
acquisition) arrive as two micro-batches; the decoded tile set and the
running stats match the batch reader exactly."""

from __future__ import annotations

import os

import numpy as np
import pytest

from spatialdata_spark.operators.raster import RasterMeta
from spatialdata_spark.sources.zarrio import _compress, _compressor_doc, _write_json
from spatialdata_spark.streaming.tiles import streaming_tile_ingest, streaming_tile_stats

TS = 16


def _write_zarray(path, h, w):
    _write_json(
        os.path.join(path, ".zarray"),
        {
            "zarr_format": 2,
            "shape": [h, w],
            "chunks": [TS, TS],
            "dtype": "<f8",
            "compressor": _compressor_doc("zlib"),
            "fill_value": 0,
            "order": "C",
            "filters": None,
        },
    )


def _write_chunk(path, ty, tx, arr):
    with open(os.path.join(path, f"{ty}.{tx}"), "wb") as f:
        f.write(_compress("zlib", np.ascontiguousarray(arr).tobytes()))


def test_streaming_ingest_two_waves(spark, tmp_path):
    store = str(tmp_path / "arr")
    os.makedirs(store)
    rng = np.random.default_rng(9)
    full = rng.integers(1, 50, size=(2 * TS, 2 * TS)).astype(np.float64)
    _write_zarray(store, 2 * TS, 2 * TS)
    # wave 1: two chunks present before the stream starts
    _write_chunk(store, 0, 0, full[:TS, :TS])
    _write_chunk(store, 0, 1, full[:TS, TS:])

    tiles, meta = streaming_tile_ingest(spark, store)
    assert meta.tile == TS and meta.height == 2 * TS
    stats = streaming_tile_stats(tiles)
    q = (
        stats.writeStream.format("memory")
        .queryName("tile_stats")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        row = spark.sql("SELECT * FROM tile_stats").first()
        assert row["n_tiles"] == 2
        assert row["pixel_sum"] == pytest.approx(full[:TS, :].sum())

        # wave 2: the acquisition writes two more chunks mid-stream
        _write_chunk(store, 1, 0, full[TS:, :TS])
        _write_chunk(store, 1, 1, full[TS:, TS:])
        q.processAllAvailable()
        row = spark.sql("SELECT * FROM tile_stats").first()
        assert row["n_tiles"] == 4
        assert row["pixel_sum"] == pytest.approx(full.sum())
        assert row["pixel_max"] == pytest.approx(full.max())
    finally:
        q.stop()


def test_streaming_ingest_requires_metadata(spark, tmp_path):
    with pytest.raises(ValueError, match="zarray"):
        streaming_tile_ingest(spark, str(tmp_path / "nothing"))
