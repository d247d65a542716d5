"""Re-implementation of the reference's asv benchmark workload shapes
(BASELINE.md §1/§3 — the reference publishes no absolute numbers, only
these scenes) so regressions are tracked the same way the reference
tracks them:

- TimeQueries.time_query_bounding_box / time_query_polygon_box:
  cluster-blobs point sets (length in {100, 1k, 10k} extent, ~1k
  transcripts per cell), quarter-extent query box / polygon.
- TimeMapRaster.time_map_blocks: x+1 over tiles, length in {100, 1k, 10k}.
- TimeDataloader.time_init / time_fetch: 500 circle regions r=32 over a
  2048x2048 extent — the multi-box tile sweep.

    python tools/asv_shapes.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spatialdata_spark.session import get_spark  # noqa: E402


def cluster_blobs(spark, length: int, points_per_cell: int = 1000, n_cells: int = 10, seed: int = 0):
    """Synthetic transcripts-around-cell-centers scene (the reference's
    `cluster_blobs`): n_cells gaussian blobs over a length x length extent."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, length, (n_cells, 2))
    idx = rng.integers(0, n_cells, n_cells * points_per_cell)
    xy = centers[idx] + rng.normal(0, length / 50.0, (len(idx), 2))
    import pandas as pd

    pdf = pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1], "cell": idx.astype("int64")})
    return spark.createDataFrame(pdf).repartition(32).persist()


def main() -> None:
    from spatialdata_spark.operators.raster import RasterMeta, long_to_tiles, map_tiles
    from spatialdata_spark.operators.spatial_query import (
        bounding_box_query_multibox,
        bounding_box_query_points,
        polygon_query_points,
    )

    spark = get_spark("asv-shapes")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    for length in [100, 1_000, 10_000]:
        pts = cluster_blobs(spark, length)
        pts.count()  # materialize the persist outside the timed region
        box_lo = [0.0, 0.0]
        box_hi = [length / 2.0, length / 2.0]
        t0 = time.perf_counter()
        bounding_box_query_points(pts, ("x", "y"), box_lo, box_hi).count()
        results[f"bbox_query_len{length}"] = round(time.perf_counter() - t0, 3)

        tri = np.array([[0.0, 0.0], [length / 2.0, 0.0], [length / 2.0, length / 2.0], [0.0, length / 2.0]])
        t0 = time.perf_counter()
        polygon_query_points(pts, tri).count()
        results[f"polygon_query_len{length}"] = round(time.perf_counter() - t0, 3)
        pts.unpersist()

    for length in [100, 1_000, 10_000]:
        tile = 256
        meta = RasterMeta(height=length, width=length, tile=tile, dtype="float64", n_channels=1)
        n = (length + tile - 1) // tile
        base = spark.range(n * n).select(
            (F.col("id") % n).alias("ty"), (F.col("id") / n).cast("long").alias("tx")
        )
        long_px = base.select(
            (F.col("ty") * tile).alias("y"), (F.col("tx") * tile).alias("x"), F.lit(1.0).alias("value")
        )
        tiles = long_to_tiles(long_px, meta).persist()
        tiles.count()
        t0 = time.perf_counter()
        map_tiles(tiles, lambda a: a + 1, meta).count()
        results[f"map_blocks_len{length}"] = round(time.perf_counter() - t0, 3)
        tiles.unpersist()

    # dataloader sweep: 500 circle tiles r=32 over 2048x2048
    pts = cluster_blobs(spark, 2048, points_per_cell=2000, n_cells=50)
    pts.count()
    rng = np.random.default_rng(1)
    centers = rng.uniform(64, 2048 - 64, (500, 2))
    t0 = time.perf_counter()
    mins = [[float(c[0] - 32), float(c[1] - 32)] for c in centers]
    maxs = [[float(c[0] + 32), float(c[1] + 32)] for c in centers]
    results["dataloader_init"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    bounding_box_query_multibox(pts, ("x", "y"), mins, maxs).groupBy("box_id").count().count()
    results["dataloader_fetch_500_tiles"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
