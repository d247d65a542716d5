"""In-memory demo dataset generators (reference: datasets.py:37-106
``blobs()`` — image + labels + points + circles + annotation table in
one container).  Deterministic (seeded numpy), used by tests and docs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from spatialdata_spark.catalog import SpatialDataset
from spatialdata_spark.operators.raster import RasterMeta, long_to_tiles
from spatialdata_spark.operators.vectorize import circles_to_shapes
from spatialdata_spark.transformations import Identity


def blobs(
    spark: SparkSession,
    length: int = 128,
    n_cells: int = 12,
    n_points: int = 500,
    seed: int = 42,
) -> tuple[SpatialDataset, RasterMeta]:
    """Synthetic scene: gaussian-blob image, circular-cell labels,
    transcripts points, cell circles, and a per-cell annotation table.

    Layout mirrors the reference's ``blobs()``: every element annotates
    the same ``length``×``length`` canvas in the ``global`` CS.
    """
    rng = np.random.default_rng(seed)
    centers = rng.uniform(length * 0.1, length * 0.9, size=(n_cells, 2))
    radii = rng.uniform(length * 0.03, length * 0.08, size=n_cells)

    # image: sum of gaussian bumps at the cell centers (dense long form)
    yy, xx = np.mgrid[0:length, 0:length]
    img = np.zeros((length, length))
    for (cx, cy), r in zip(centers, radii):
        img += np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
    img = np.round(img * 100.0)

    # labels: nearest cell id within its radius, else 0
    labels = np.zeros((length, length), dtype=np.int64)
    best = np.full((length, length), np.inf)
    for i, ((cx, cy), r) in enumerate(zip(centers, radii)):
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        hit = (d2 <= r * r) & (d2 < best)
        labels[hit] = i + 1
        best = np.where(hit, d2, best)

    # points: transcripts scattered around centers + background noise
    cell_of_point = rng.integers(0, n_cells, n_points)
    pxy = centers[cell_of_point] + rng.normal(0, 4.0, size=(n_points, 2))
    genes = rng.choice(["a", "b", "c"], n_points)

    meta = RasterMeta(height=length, width=length, tile=64)
    lmeta = RasterMeta(height=length, width=length, tile=64, dtype="i8")

    iyy, ixx = np.nonzero(img)
    img_df = spark.createDataFrame(
        [(int(y), int(x), float(img[y, x])) for y, x in zip(iyy, ixx)], ["y", "x", "value"]
    )
    lyy, lxx = np.nonzero(labels)
    lab_df = spark.createDataFrame(
        [(int(y), int(x), int(labels[y, x])) for y, x in zip(lyy, lxx)], ["y", "x", "label"]
    )
    pts_df = spark.createDataFrame(
        [
            (float(x), float(y), int(c) + 1, str(g))
            for (x, y), c, g in zip(pxy, cell_of_point, genes)
        ],
        ["x", "y", "instance_id", "gene"],
    )
    circles_df = circles_to_shapes(
        spark.createDataFrame(
            [
                (i + 1, float(cx), float(cy), float(r))
                for i, ((cx, cy), r) in enumerate(zip(centers, radii))
            ],
            ["shape_id", "x", "y", "radius"],
        )
    )
    table_df = spark.createDataFrame(
        [
            ("blobs_circles", i + 1, float(radii[i]), int((labels == i + 1).sum()))
            for i in range(n_cells)
        ],
        ["region", "instance_id", "radius_true", "n_pixels"],
    )

    ds = SpatialDataset(spark)
    ds.add_images("blobs_image", long_to_tiles(img_df, meta), {"global": Identity()})
    ds.add_labels("blobs_labels", lab_df.select("y", "x", "label"), {"global": Identity()})
    ds.add_points("blobs_points", pts_df, {"global": Identity()})
    ds.add_shapes("blobs_circles", circles_df, {"global": Identity()})
    ds.add_table("blobs_table", table_df, region="blobs_circles")
    return ds, meta
