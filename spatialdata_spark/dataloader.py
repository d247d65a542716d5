"""Training-tile dataset — the reference's ``dataloader`` module.

Reference: ``spatialdata/dataloader/datasets.py`` (ImageTilesDataset)
— per-region image windows, usually centered on circle shapes, fed to a
torch DataLoader with an optional per-sample ``transform`` hook.

The Spark version plans the whole sweep as ONE job
(:func:`spatialdata_spark.operators.raster.export_region_tiles` — the
multi-box explode + tile join + per-region assembly), then streams the
assembled crops back with ``toLocalIterator`` so the driver never holds
more than one partition of tiles.  At training time this is the right
shape: tile assembly is distributed, and the iterator is the
framework-agnostic feed (torch/JAX wrap it without this library
depending on either).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialdata_spark.operators.raster import RasterMeta, export_region_tiles


class ImageTilesDataset:
    """Iterable of ``(region_id, array)`` training tiles.

    Parameters mirror the reference (datasets.py:93-124): raster tiles +
    circle regions (window centered on each circle's center), a target
    tile size in pixels, and an optional per-sample ``transform``
    callable applied to the numpy array before it is yielded.

    SCALE NOTE: :meth:`dataframe` is the at-scale entry — the planned
    crop table stays distributed and composes with further Spark
    stages (the registry's ``rt_dataset_tiles`` sweep runs that way).
    ``__iter__`` exists for the training-loader API contract: it
    streams crops to the DRIVER via ``toLocalIterator`` (one partition
    in flight), which is the right shape for feeding a single training
    process but is by construction not distributed.
    """

    def __init__(
        self,
        tiles: DataFrame,
        meta: RasterMeta,
        regions: DataFrame,
        tile_px: int = 32,
        scale: int = 0,
        transform: Callable[[np.ndarray], np.ndarray] | None = None,
    ):
        self.meta = meta
        self.tile_px = int(tile_px)
        self.transform = transform
        if "cy" not in regions.columns and "wkb" in regions.columns:
            # circle shapes: window centers from the bbox midpoint
            regions = regions.select(
                F.col("shape_id").alias("region_id"),
                ((F.col("miny") + F.col("maxy")) / 2.0).alias("cy"),
                ((F.col("minx") + F.col("maxx")) / 2.0).alias("cx"),
            )
        self._crops = export_region_tiles(tiles, meta, regions, self.tile_px, scale=scale)
        self._count: int | None = None

    def __len__(self) -> int:
        if self._count is None:
            self._count = self._crops.select("region_id").distinct().count()
        return self._count

    def dataframe(self) -> DataFrame:
        """The planned crop table ``(region_id, c, y0, x0, data)`` —
        compose further Spark stages on it instead of iterating."""
        return self._crops

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        dt = np.dtype(self.meta.dtype)
        px = self.tile_px
        n_c = self.meta.n_channels
        # group channel rows per region driver-side; rows for one region
        # arrive from one partition (groupBy key), so channel collation
        # is a tiny reorder buffer
        pending: dict[int, dict[int, np.ndarray]] = {}
        for row in self._crops.toLocalIterator(prefetchPartitions=True):
            rid = int(row["region_id"])
            a = np.frombuffer(bytes(row["data"]), dtype=dt).reshape(px, px)
            chans = pending.setdefault(rid, {})
            chans[int(row["c"])] = a
            if len(chans) == n_c:
                stacked = np.stack([chans[c] for c in sorted(chans)])
                out = stacked[0] if n_c == 1 else stacked
                if self.transform is not None:
                    out = self.transform(out)
                yield rid, out
                del pending[rid]
