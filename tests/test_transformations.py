import numpy as np
import pytest

from spatialdata_spark.transformations import (
    Affine,
    Identity,
    MapAxis,
    Scale,
    Sequence,
    Translation,
    get_output_axes,
    scale_radii_factor,
)
from spatialdata_spark.transformations.graph import (
    estimate_affine_from_landmarks,
    get_transformation_between,
)

XY = ("x", "y")


def test_identity_matrix():
    m = Identity().to_affine_matrix(XY, XY)
    assert np.allclose(m, np.eye(3))


def test_identity_embeds_in_larger_output():
    m = Identity().to_affine_matrix(("x", "y"), ("c", "x", "y"))
    assert m.shape == (4, 3)
    assert m[1, 0] == 1 and m[2, 1] == 1 and m[0, 0] == 0


def test_translation():
    t = Translation([10, 20], ("x", "y"))
    m = t.to_affine_matrix(XY, XY)
    assert np.allclose(m, [[1, 0, 10], [0, 1, 20], [0, 0, 1]])
    out = t.transform_coordinates(np.array([[1.0, 2.0]]), XY)
    assert np.allclose(out, [[11.0, 22.0]])
    assert t.inverse() == Translation([-10, -20], ("x", "y"))


def test_scale_partial_axes():
    s = Scale([2.0], ("y",))
    m = s.to_affine_matrix(XY, XY)
    assert np.allclose(m, [[1, 0, 0], [0, 2, 0], [0, 0, 1]])


def test_mapaxis_swap():
    t = MapAxis({"x": "y", "y": "x"})
    # output axes derive as ('y', 'x'): values carried, order renamed
    assert get_output_axes(t, XY) == ("y", "x")
    m = t.to_affine_matrix(XY, XY)  # pin output order to (x, y)
    assert np.allclose(m, [[0, 1, 0], [1, 0, 0], [0, 0, 1]])
    pt = np.array([[1.0, 2.0]])
    out = (m @ np.hstack([pt, [[1.0]]]).T).T[:, :-1]
    assert np.allclose(out, [[2.0, 1.0]])
    assert t.inverse() == MapAxis({"y": "x", "x": "y"})


def test_affine_roundtrip():
    a = Affine([[2, 0, 5], [0, 3, 7], [0, 0, 1]], XY, XY)
    pts = np.array([[1.0, 1.0], [2.0, -1.0]])
    fwd = a.transform_coordinates(pts, XY)
    back = a.inverse().transform_coordinates(fwd, XY)
    assert np.allclose(back, pts)


def test_affine_passthrough_axis():
    # affine on (x,y) applied to (x,y,z) data: z passes through
    a = Affine([[2, 0, 0], [0, 2, 0], [0, 0, 1]], XY, XY)
    axes = ("x", "y", "z")
    assert get_output_axes(a, axes) == ("z", "x", "y")
    out = a.transform_coordinates(np.array([[1.0, 2.0, 3.0]]), axes)
    # output columns ordered (z, x, y)
    assert np.allclose(out, [[3.0, 2.0, 4.0]])


def test_sequence_compose():
    seq = Sequence([Scale([2, 2], XY), Translation([1, 1], XY)])
    out = seq.transform_coordinates(np.array([[1.0, 1.0]]), XY)
    assert np.allclose(out, [[3.0, 3.0]])
    m = seq.to_affine_matrix(XY, XY)
    assert np.allclose(m, [[2, 0, 1], [0, 2, 1], [0, 0, 1]])
    inv = seq.inverse()
    assert np.allclose(inv.transform_coordinates(out, XY), [[1.0, 1.0]])


def test_sequence_axis_reorder_output():
    seq = Sequence([Translation([5], ("x",))])
    m = seq.to_affine_matrix(("x", "y"), ("y", "x"))
    assert np.allclose(m, [[0, 1, 0], [1, 0, 5], [0, 0, 1]])


def test_scale_radii_factor_isotropic():
    assert scale_radii_factor(Scale([3, 3], XY)) == pytest.approx(3.0)
    assert scale_radii_factor(Scale([2, 4], XY)) == pytest.approx(3.0)


def test_graph_resolution_via_shared_cs():
    transforms = {
        "pts": {"cs1": Translation([1, 0], XY)},
        "shp": {"cs1": Translation([0, 1], XY), "cs2": Scale([2, 2], XY)},
    }
    t = get_transformation_between(transforms, source_element="pts", target_cs="cs2")
    out = t.transform_coordinates(np.array([[0.0, 0.0]]), XY)
    # pts -> cs1 (+1,0), cs1 -> shp (-0,-1), shp -> cs2 (*2)
    assert np.allclose(out, [[2.0, -2.0]])


def test_graph_no_path_raises():
    transforms = {"a": {"cs1": Identity()}, "b": {"cs2": Identity()}}
    with pytest.raises(ValueError):
        get_transformation_between(transforms, source_element="a", target_cs="cs2")


def test_landmark_estimation():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 10, (6, 2))
    true = Affine([[1.5, 0.2, 3.0], [-0.1, 2.0, -1.0], [0, 0, 1]], XY, XY)
    dst = true.transform_coordinates(src, XY)
    est = estimate_affine_from_landmarks(src, dst)
    assert np.allclose(est.matrix, true.matrix, atol=1e-8)


def test_decompose_affine_roundtrip():
    from spatialdata_spark.transformations import decompose_affine

    rng = np.random.default_rng(7)
    for _ in range(20):
        m = np.eye(3)
        m[:2, :] = rng.uniform(-3, 3, (2, 3))
        if abs(np.linalg.det(m[:2, :2])) < 1e-3:
            continue
        aff = Affine(m, XY, XY)
        seq = decompose_affine(aff, XY)
        assert np.allclose(seq.to_affine_matrix(XY, XY), m, atol=1e-9)
        scale, shear, refl, rot, trans = seq.transformations
        assert np.all(scale.scale > 0)
        sh = shear.matrix[:-1, :-1]
        assert np.allclose(np.diag(sh), 1.0) and abs(sh[1, 0]) < 1e-12
        q = rot.matrix[:-1, :-1]
        assert np.allclose(q @ q.T, np.eye(2), atol=1e-9)
        assert np.linalg.det(q) > 0
        assert set(np.unique(refl.scale)) <= {1.0, -1.0}


def test_decompose_affine_3d_and_singular():
    from spatialdata_spark.transformations import decompose_affine

    axes = ("z", "y", "x")
    rng = np.random.default_rng(11)
    m = np.eye(4)
    m[:3, :] = rng.uniform(-2, 2, (3, 4))
    aff = Affine(m, axes, axes)
    seq = decompose_affine(aff, axes)
    assert np.allclose(seq.to_affine_matrix(axes, axes), m, atol=1e-9)
    with pytest.raises(ValueError):
        decompose_affine(Affine([[1, 0, 0], [1, 0, 0], [0, 0, 1]], XY, XY), XY)


def test_landmark_similarity_recovered_exactly(spark):
    """A known rotation+scale+translation is recovered to machine
    precision from 5 landmark pairs (reference operations.py:347-444)."""
    import numpy as np

    from spatialdata_spark.transformations import get_transformation_between_landmarks

    rng = np.random.default_rng(3)
    mov = rng.uniform(0, 100, size=(5, 2))
    th, s, t = 0.7, 1.8, np.array([12.0, -4.0])
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    ref = mov @ (s * rot).T + t

    mdf = spark.createDataFrame([(float(x), float(y)) for x, y in mov], ["x", "y"])
    rdf = spark.createDataFrame([(float(x), float(y)) for x, y in ref], ["x", "y"])
    aff = get_transformation_between_landmarks(rdf, mdf)
    m = aff.to_affine_matrix(("x", "y"), ("x", "y"))
    mapped = mov @ m[:2, :2].T + m[:2, 2]
    assert np.allclose(mapped, ref, atol=1e-9)


def test_landmark_reflection_case(spark):
    """Mirrored landmarks: the affine pre-fit detects det<0 and the
    flip-compose path still maps moving onto reference."""
    import numpy as np

    from spatialdata_spark.transformations import get_transformation_between_landmarks

    rng = np.random.default_rng(5)
    mov = rng.uniform(0, 50, size=(6, 2))
    ref = np.column_stack([-mov[:, 0] * 2.0 + 7.0, mov[:, 1] * 2.0 + 3.0])  # reflect+scale+shift
    aff = get_transformation_between_landmarks(ref, mov)
    m = aff.to_affine_matrix(("x", "y"), ("x", "y"))
    assert np.linalg.det(m[:2, :2]) < 0  # reflection preserved
    mapped = mov @ m[:2, :2].T + m[:2, 2]
    assert np.allclose(mapped, ref, atol=1e-9)


def test_align_elements_using_landmarks(spark):
    import numpy as np

    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.transformations import (
        Identity,
        Scale,
        align_elements_using_landmarks,
    )

    pts_ref = spark.createDataFrame([(i, float(i * 3), float(i)) for i in range(4)], "id long, x double, y double")
    pts_mov = spark.createDataFrame([(i, float(i), float(i * 2)) for i in range(4)], "id long, x double, y double")
    ds = SpatialDataset(spark)
    ds.add_points("ref", pts_ref, {"global": Identity()})
    ds.add_points("mov", pts_mov, {"global": Scale([2.0, 2.0], ("x", "y"))})

    # landmarks: mov corners should land on ref corners
    mov_lm = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    ref_lm = np.array([[5.0, 5.0], [25.0, 5.0], [25.0, 25.0]])
    new_t = align_elements_using_landmarks(ds, ref_lm, mov_lm, "ref", "mov", new_coordinate_system="aligned")
    assert "aligned" in ds.transforms["mov"] and "aligned" in ds.transforms["ref"]
    # the new transform = old scale then the landmark similarity
    m = new_t.to_affine_matrix(("x", "y"), ("x", "y"))
    mapped = mov_lm / 2.0 @ m[:2, :2].T + m[:2, 2]  # undo: landmarks were in post-scale space?
    # landmark fit maps the raw landmark space; verify the similarity part alone
    sim = ds.get_transformation("mov", "aligned")
    lm_mapped = np.hstack([mov_lm, np.ones((3, 1))]) @ sim.to_affine_matrix(("x", "y"), ("x", "y"))[:2, :].T
    # composed transform includes the old scale first, so feed pre-scale coords
    pre = mov_lm / 2.0
    lm2 = np.hstack([pre, np.ones((3, 1))]) @ m[:2, :].T
    assert np.allclose(lm2, ref_lm, atol=1e-9)


def test_transform_to_cs_images(spark):
    from spatialdata_spark.catalog import SpatialDataset
    from spatialdata_spark.operators.transform import transform_to_coordinate_system
    from spatialdata_spark.transformations import Translation

    img = spark.createDataFrame(
        [(0, y, x, float(y * 10 + x)) for y in range(4) for x in range(4)],
        "c int, y long, x long, value double",
    )
    ds = SpatialDataset(spark)
    ds.add_images("img", img, {"shifted": Translation([5.0, 7.0], ("x", "y"))})
    out = transform_to_coordinate_system(ds, "img", "shifted")
    got = {(r["y"], r["x"]): r["value"] for r in out.collect()}
    assert got[(7, 5)] == 0.0 and got[(10, 8)] == 33.0

    # tables have no coordinates: explicit error, not a silent pass
    t = spark.createDataFrame([(1, "cells")], "instance_id long, region string")
    ds.add_table("tab", t, region="img")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tables"):
        transform_to_coordinate_system(ds, "tab", "shifted")
