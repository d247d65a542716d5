"""Global settings (reference: ``src/spatialdata/config.py:8-27``).

The reference's two knobs map onto this engine as: shapes geometry
encoding (we always write WKB — geoarrow acceptance is read-side only,
see ``sources/readers.py``) and a large-chunk warning threshold used by
the zarr writer.  ``dask_tune_optimization`` exists only so the
reference's ``disable_dask_tune_optimization()`` entry point has a real
effect to toggle; Spark has no dask graph to tune, so it is
documentation-level state.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Settings:
    shapes_geometry_encoding: str = "WKB"
    large_chunk_threshold_bytes: int = 2147483647
    dask_tune_optimization: bool = True


settings = Settings()


def disable_dask_tune_optimization() -> None:
    """Reference-parity toggle (``spatialdata.disable_dask_tune_optimization``).

    Spark's Catalyst/AQE planning replaces the reference's dask graph
    tuning entirely; the flag is recorded so code written against the
    reference API runs unchanged.
    """
    settings.dask_tune_optimization = False
