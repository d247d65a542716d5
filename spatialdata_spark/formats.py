"""Store format versioning + migration.

Reference: ``src/spatialdata/_io/format.py:56-267`` — a version matrix
per element kind (RasterFormatV01/02, ShapesFormatV01/02/03, ...) with
a parser dispatching on the version string recorded in the store and
raising a named error for unknown versions.  This module is the
parquet-store counterpart: the manifest records a container format
version plus per-element-kind versions, old manifests are migrated
forward in memory at read time, and unknown versions fail with a clear
error instead of mis-parsing.

Version history:

* ``0.1`` — round-1 layout: flat manifest, transformations stored in
  the library-private ``to_dict`` form.
* ``0.2`` — adds the ``format`` block with per-kind element versions
  and stores transformations in the NGFF dict form (type + payload +
  input/output coordinate systems, see ``sources/zarrio.py``), i.e.
  the same serialization the zarr store uses.
"""

from __future__ import annotations

from typing import Any

from spatialdata_spark.transformations import BaseTransformation

CONTAINER_VERSIONS = ("0.1", "0.2")
CURRENT_VERSION = "0.2"

#: per-element-kind format versions written by the current code
ELEMENT_VERSIONS = {
    "points": "0.2",
    "shapes": "0.2",
    "labels": "0.2",
    "images": "0.2",
    "tables": "0.2",
}


def parse_version(meta: dict[str, Any]) -> str:
    v = meta.get("version")
    if v not in CONTAINER_VERSIONS:
        raise ValueError(
            f"unsupported store format version {v!r}; supported: {CONTAINER_VERSIONS} "
            "(newer stores need a newer library; older ones migrate automatically)"
        )
    return v


def transforms_to_manifest(cs_map: dict[str, BaseTransformation]) -> dict[str, dict]:
    """Current (0.2) serialization: NGFF dict per coordinate system."""
    from spatialdata_spark.sources.zarrio import transformation_to_ngff

    return {cs: transformation_to_ngff(t, ("x", "y"), cs) for cs, t in cs_map.items()}


def transforms_from_manifest(version: str, d: dict[str, dict]) -> dict[str, BaseTransformation]:
    if version == "0.1":
        return {cs: BaseTransformation.from_dict(td) for cs, td in d.items()}
    from spatialdata_spark.sources.zarrio import transformation_from_ngff

    return {cs: transformation_from_ngff(td)[0] for cs, td in d.items()}


def migrate_manifest(meta: dict[str, Any]) -> dict[str, Any]:
    """Upgrade a manifest dict to the current version in memory.

    0.1 -> 0.2: wrap transforms into the NGFF form and add the
    ``format`` block.  (The parquet payloads are identical between the
    two versions, so migration is metadata-only — mirroring how the
    reference's ShapesFormatV02->V03 reuses the same parquet leaf.)
    """
    version = parse_version(meta)
    if version == CURRENT_VERSION:
        return meta
    out = dict(meta)
    # parse with the old rules, re-serialize with the new
    parsed = {
        name: transforms_from_manifest(version, cs_map)
        for name, cs_map in meta.get("transforms", {}).items()
    }
    out["transforms"] = {name: transforms_to_manifest(m) for name, m in parsed.items()}
    out["version"] = CURRENT_VERSION
    out["format"] = {"container": CURRENT_VERSION, "elements": dict(ELEMENT_VERSIONS)}
    return out


#: reference-parity alias (``_io/format.py:294``): the reference's
#: SpatialDataFormatType is a union of format classes; this engine's
#: formats are the plain version strings in CONTAINER_VERSIONS /
#: ELEMENT_VERSIONS, so the type is str.
SpatialDataFormatType = str
