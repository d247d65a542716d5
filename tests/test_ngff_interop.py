"""NGFF transformation interop: parse foreign NGFF JSON (with units and
full coordinate-system metadata), convert to the native algebra, verify
the affine matrices, and round-trip back to the wire form.  Mirrors the
reference's transformations/ngff/ class surface
(ngff_transformations.py:283-1120, ngff_coordinate_system.py:14-110)."""

from __future__ import annotations

import numpy as np
import pytest

from spatialdata_spark.transformations import Affine, Identity, Scale, Sequence, Translation
from spatialdata_spark.transformations.ngff import (
    NgffAxis,
    NgffCoordinateSystem,
    NgffTransformation,
    get_default_coordinate_system,
)

MICRON_CS = {
    "name": "microns",
    "axes": [
        {"name": "x", "type": "space", "unit": "micrometer"},
        {"name": "y", "type": "space", "unit": "micrometer"},
    ],
}
PIXEL_CS = {
    "name": "pixels",
    "axes": [
        {"name": "x", "type": "space", "unit": "pixel"},
        {"name": "y", "type": "space", "unit": "pixel"},
    ],
}


def test_coordinate_system_roundtrip_with_units():
    cs = NgffCoordinateSystem.from_dict(MICRON_CS)
    assert cs.name == "microns"
    assert cs.axes_names == ("x", "y")
    assert cs.axes[0].unit == "micrometer"
    assert cs.to_dict() == MICRON_CS
    assert NgffCoordinateSystem.from_json(cs.to_json()) == cs


def test_coordinate_system_validation():
    with pytest.raises(ValueError, match="name"):
        NgffCoordinateSystem.from_dict({"axes": []})
    with pytest.raises(ValueError, match="unique"):
        NgffCoordinateSystem("bad", [NgffAxis("x", "space"), NgffAxis("x", "space")])
    with pytest.raises(ValueError, match="name and a type"):
        NgffAxis.from_dict({"name": "x"})


def test_default_coordinate_system():
    cs = get_default_coordinate_system(("c", "y", "x"))
    assert [a.type for a in cs.axes] == ["channel", "space", "space"]


@pytest.mark.parametrize(
    "doc, expected",
    [
        ({"type": "identity", "input": PIXEL_CS, "output": MICRON_CS}, np.eye(3)),
        (
            {"type": "scale", "scale": [2.0, 0.5], "input": PIXEL_CS, "output": MICRON_CS},
            np.diag([2.0, 0.5, 1.0]),
        ),
        (
            {"type": "translation", "translation": [3.0, -1.0], "input": PIXEL_CS, "output": MICRON_CS},
            np.array([[1, 0, 3.0], [0, 1, -1.0], [0, 0, 1]]),
        ),
        (
            {"type": "affine", "affine": [[1, 2, 3], [4, 5, 6]], "input": PIXEL_CS, "output": MICRON_CS},
            np.array([[1, 2, 3], [4, 5, 6], [0, 0, 1.0]]),
        ),
        (
            {"type": "rotation", "rotation": [0.0, -1.0, 1.0, 0.0], "input": PIXEL_CS, "output": MICRON_CS},
            np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]),
        ),
    ],
)
def test_foreign_ngff_to_native_matrix(doc, expected):
    t = NgffTransformation.from_dict(doc).to_native()
    np.testing.assert_allclose(t.to_affine_matrix(("x", "y"), ("x", "y")), expected)


def test_sequence_from_foreign_store():
    doc = {
        "type": "sequence",
        "transformations": [
            {"type": "scale", "scale": [2.0, 2.0]},
            {"type": "translation", "translation": [10.0, 20.0]},
        ],
        "input": PIXEL_CS,
        "output": MICRON_CS,
    }
    t = NgffTransformation.from_dict(doc).to_native(("x", "y"), ("x", "y"))
    m = t.to_affine_matrix(("x", "y"), ("x", "y"))
    np.testing.assert_allclose(m, np.array([[2, 0, 10.0], [0, 2, 20.0], [0, 0, 1]]))


def test_by_dimension_partition():
    """byDimension: per-axis-subset transforms whose outputs partition
    the output CS (reference ngff_transformations.py:1055)."""
    cs3_in = {
        "name": "in3",
        "axes": [
            {"name": "x", "type": "space", "unit": "pixel"},
            {"name": "y", "type": "space", "unit": "pixel"},
            {"name": "z", "type": "space", "unit": "pixel"},
        ],
    }
    cs3_out = {
        "name": "out3",
        "axes": [
            {"name": "x", "type": "space", "unit": "micrometer"},
            {"name": "y", "type": "space", "unit": "micrometer"},
            {"name": "z", "type": "space", "unit": "micrometer"},
        ],
    }
    xy_in = {"name": "xy", "axes": [{"name": "x", "type": "space", "unit": "pixel"}, {"name": "y", "type": "space", "unit": "pixel"}]}
    xy_out = {"name": "xy'", "axes": [{"name": "x", "type": "space", "unit": "micrometer"}, {"name": "y", "type": "space", "unit": "micrometer"}]}
    z_in = {"name": "z", "axes": [{"name": "z", "type": "space", "unit": "pixel"}]}
    z_out = {"name": "z'", "axes": [{"name": "z", "type": "space", "unit": "micrometer"}]}
    doc = {
        "type": "byDimension",
        "transformations": [
            {"type": "scale", "scale": [2.0, 3.0], "input": xy_in, "output": xy_out},
            {"type": "translation", "translation": [7.0], "input": z_in, "output": z_out},
        ],
        "input": cs3_in,
        "output": cs3_out,
    }
    t = NgffTransformation.from_dict(doc).to_native()
    m = t.to_affine_matrix(("x", "y", "z"), ("x", "y", "z"))
    exp = np.array([[2, 0, 0, 0], [0, 3, 0, 0], [0, 0, 1, 7.0], [0, 0, 0, 1.0]])
    np.testing.assert_allclose(m, exp)
    # non-partitioning outputs are rejected
    bad = dict(doc, transformations=[doc["transformations"][0]])
    with pytest.raises(ValueError, match="partition"):
        NgffTransformation.from_dict(bad).to_native()


def test_native_to_ngff_roundtrip():
    cs_in = NgffCoordinateSystem.from_dict(PIXEL_CS)
    cs_out = NgffCoordinateSystem.from_dict(MICRON_CS)
    for t in (
        Identity(),
        Scale([2.0, 0.5], ("x", "y")),
        Translation([1.0, 2.0], ("x", "y")),
        Affine([[1, 2, 3], [4, 5, 6], [0, 0, 1]], ("x", "y"), ("x", "y")),
        Sequence([Scale([2.0, 2.0], ("x", "y")), Translation([1.0, 1.0], ("x", "y"))]),
    ):
        w = NgffTransformation.from_native(t, cs_in, cs_out)
        d = w.to_dict()
        assert d["input"] == PIXEL_CS and d["output"] == MICRON_CS
        back = NgffTransformation.from_dict(d).to_native(("x", "y"), ("x", "y"))
        np.testing.assert_allclose(
            back.to_affine_matrix(("x", "y"), ("x", "y")),
            t.to_affine_matrix(("x", "y"), ("x", "y")),
        )


def test_unknown_type_rejected():
    with pytest.raises(ValueError, match="unknown NGFF"):
        NgffTransformation.from_dict({"type": "displacementField"})
