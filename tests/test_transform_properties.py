"""Property-based tests (hypothesis) for the transformation algebra.

The reference has no randomized testing (SURVEY.md §5); these harden the
algebraic core our Catalyst expression generation depends on: composed
matrices, inverses, and decomposition must agree with direct coordinate
math for arbitrary well-conditioned affines.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialdata_spark.transformations import (
    Affine,
    Scale,
    Sequence,
    Translation,
    decompose_affine,
    scale_radii_factor,
)

XY = ("x", "y")

finite = st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False)
nonzero = st.floats(min_value=0.1, max_value=50).flatmap(
    lambda m: st.sampled_from([m, -m])
)


def _well_conditioned(mat: np.ndarray) -> bool:
    det = mat[0, 0] * mat[1, 1] - mat[0, 1] * mat[1, 0]
    return abs(det) > 1e-3 and np.all(np.abs(mat) < 1e3)


@st.composite
def affines(draw):
    vals = [draw(finite) for _ in range(6)]
    m = np.array([[vals[0], vals[1], vals[4]], [vals[2], vals[3], vals[5]], [0, 0, 1.0]])
    return m


@given(affines(), st.lists(st.tuples(finite, finite), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_affine_roundtrip_inverse(m, pts):
    if not _well_conditioned(m[:2, :2]):
        return
    aff = Affine(m, XY, XY)
    coords = np.array(pts, dtype=float)
    fwd = aff.transform_coordinates(coords, XY)
    back = aff.inverse().transform_coordinates(fwd, XY)
    scale = np.maximum(1.0, np.abs(coords))
    cond = abs(np.linalg.cond(m[:2, :2]))
    assert np.all(np.abs(back - coords) / scale < 1e-6 * max(cond, 1.0))


@given(affines(), affines(), st.lists(st.tuples(finite, finite), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_sequence_matches_matrix_product(m1, m2, pts):
    a1 = Affine(m1, XY, XY)
    a2 = Affine(m2, XY, XY)
    seq = Sequence([a1, a2])
    coords = np.array(pts, dtype=float)
    via_seq = seq.transform_coordinates(coords, XY)
    step = a2.transform_coordinates(a1.transform_coordinates(coords, XY), XY)
    assert np.allclose(via_seq, step, rtol=1e-9, atol=1e-9)
    assert np.allclose(seq.to_affine_matrix(XY, XY), m2 @ m1, rtol=1e-9, atol=1e-9)


@given(affines())
@settings(max_examples=200, deadline=None)
def test_decompose_recomposes(m):
    if not _well_conditioned(m[:2, :2]):
        return
    aff = Affine(m, XY, XY)
    seq = decompose_affine(aff, XY)
    scale_mag = float(np.max(np.abs(m))) or 1.0
    assert np.allclose(seq.to_affine_matrix(XY, XY), m, atol=1e-9 * max(scale_mag, 1.0))


@given(st.tuples(nonzero, nonzero), st.tuples(finite, finite))
@settings(max_examples=100, deadline=None)
def test_scale_translate_compose_commute_correctly(sc, tr):
    s = Scale(list(sc), XY)
    t = Translation(list(tr), XY)
    # scale-then-translate: x' = s*x + t
    m = Sequence([s, t]).to_affine_matrix(XY, XY)
    assert np.allclose(np.diag(m)[:2], sc)
    assert np.allclose(m[:2, 2], tr)
    # translate-then-scale: x' = s*(x + t)
    m2 = Sequence([t, s]).to_affine_matrix(XY, XY)
    assert np.allclose(m2[:2, 2], np.array(sc) * np.array(tr))


@given(st.floats(min_value=0.1, max_value=20), st.floats(min_value=-np.pi, max_value=np.pi))
@settings(max_examples=100, deadline=None)
def test_radius_factor_rotation_invariant(s, theta):
    rot = np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), 0],
            [s * np.sin(theta), s * np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    f = scale_radii_factor(Affine(rot, XY, XY))
    assert abs(f - s) < 1e-9 * max(s, 1.0)
