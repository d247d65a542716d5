"""Store format versioning: dispatch, migration, unknown-version error."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest


def _mk_ds(spark):
    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.transformations import Scale, Sequence, Translation

    pts = spark.createDataFrame([(i, float(i), float(2 * i)) for i in range(10)], "id long, x double, y double")
    t = Sequence([Scale([2.0, 3.0], ("x", "y")), Translation([1.0, -1.0], ("x", "y"))])
    return SpatialDataset(spark).add_points("pts", pts, {"global": t})


def test_write_records_current_format(spark, tmp_path):
    from spatialdata_spark.formats import CURRENT_VERSION

    p = str(tmp_path / "store")
    _mk_ds(spark).write(p)
    meta = json.load(open(os.path.join(p, "spatialdataset.json")))
    assert meta["version"] == CURRENT_VERSION
    assert meta["format"]["elements"]["points"] == "0.2"
    # 0.2 stores transforms in the NGFF dict form
    tdict = meta["transforms"]["pts"]["global"]
    assert tdict["type"] == "sequence" and "input" in tdict


def test_read_migrates_v01_manifest(spark, tmp_path):
    """A round-1 (0.1) store — legacy to_dict transforms, no format
    block — reads transparently with identical transform semantics."""
    from spatialdata_spark.catalog import SpatialDataset

    p = str(tmp_path / "store")
    ds = _mk_ds(spark)
    ds.write(p)
    meta_path = os.path.join(p, "spatialdataset.json")
    meta = json.load(open(meta_path))
    # rewrite the manifest exactly as the 0.1 writer produced it
    meta["version"] = "0.1"
    meta.pop("format")
    meta["transforms"]["pts"] = {"global": ds.get_transformation("pts", "global").to_dict()}
    json.dump(meta, open(meta_path, "w"))

    back = SpatialDataset.read(spark, p)
    m0 = ds.get_transformation("pts", "global").to_affine_matrix(("x", "y"), ("x", "y"))
    m1 = back.get_transformation("pts", "global").to_affine_matrix(("x", "y"), ("x", "y"))
    assert np.allclose(m0, m1)


def test_unknown_version_raises(spark, tmp_path):
    from spatialdata_spark.catalog import SpatialDataset

    p = str(tmp_path / "store")
    _mk_ds(spark).write(p)
    meta_path = os.path.join(p, "spatialdataset.json")
    meta = json.load(open(meta_path))
    meta["version"] = "9.9"
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="9.9"):
        SpatialDataset.read(spark, p)
