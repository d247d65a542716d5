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


def test_streaming_hdr_buckets_match_batch(spark, tmp_path):
    """Two waves of values through the streaming HDR sketch: after each
    wave the streamed bucket table equals the batch sketch's buckets on
    the data so far — the bounded-state mergeability contract."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spatialdata_spark.streaming.windows import streaming_hdr_buckets

    src = str(tmp_path / "vals")
    os.makedirs(src)
    rng = random.Random(23)
    wave1 = [(rng.lognormvariate(0, 1.0),) for _ in range(3000)]
    wave2 = [(rng.uniform(0, 500),) for _ in range(2000)]
    schema = T.StructType([T.StructField("value", T.DoubleType())])
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode("append").parquet(src)

    def batch_buckets(rows):
        df = spark.createDataFrame(rows, schema)
        m = F.floor(F.col("value") * F.lit(1_000_000)).cast("long")
        pos = F.when(m > 0, m).otherwise(F.lit(0))
        e = F.when(pos > 0, F.length(F.bin(pos))).otherwise(F.lit(0))
        sh = F.greatest(e - F.lit(6), F.lit(0))
        staged = df.select(pos.alias("__pos"), e.alias("e"), sh.alias("sh"))
        return {
            (r["e"], r["sub"], r["sh"]): r["n"]
            for r in staged.select(
                "e",
                F.expr("shiftright(__pos, cast(sh AS int))").alias("sub"),
                "sh",
            )
            .groupBy("e", "sub", "sh")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }

    q = streaming_hdr_buckets(spark, src, schema, query_name="hdrq")
    try:
        q.processAllAvailable()
        got1 = {
            (r["e"], r["sub"], r["sh"]): r["n"]
            for r in spark.sql("SELECT * FROM hdrq").collect()
        }
        assert got1 == batch_buckets(wave1)
        assert len(got1) <= 63 * 32  # bounded state

        spark.createDataFrame(wave2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = {
            (r["e"], r["sub"], r["sh"]): r["n"]
            for r in spark.sql("SELECT * FROM hdrq").collect()
        }
        assert got2 == batch_buckets(wave1 + wave2)
    finally:
        q.stop()
