"""Landmark-based alignment (reference:
``transformations/operations.py:347-510`` —
``get_transformation_between_landmarks`` /
``align_elements_using_landmarks``).

The reference fits with skimage's ``estimate_transform``; the same
math is the public Umeyama closed form (least-squares similarity via
SVD of the cross-covariance), implemented here directly in numpy.
Landmarks are by definition a handful of hand-placed points, so
collecting them to the driver is the correct plan — the *elements*
being aligned never move, only a tiny transformation object does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from spatialdata_spark.transformations.base import Affine, BaseTransformation, Sequence


def _umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity (rotation + uniform scale + translation)
    mapping ``src`` -> ``dst``; the standard Umeyama (1991) closed form,
    the same estimate skimage's ``estimate_transform('similarity')``
    computes.  Returns the (d+1, d+1) homogeneous matrix."""
    src = np.asarray(src, dtype=float)
    dst = np.asarray(dst, dtype=float)
    n, d = src.shape
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n
    u, s, vt = np.linalg.svd(cov)
    sign = np.ones(d)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        sign[-1] = -1.0
    r = u @ np.diag(sign) @ vt
    var_s = (sc**2).sum() / n
    scale = float((s * sign).sum() / var_s) if var_s > 0 else 1.0
    t = mu_d - scale * r @ mu_s
    m = np.eye(d + 1)
    m[:d, :d] = scale * r
    m[:d, d] = t
    return m


def _collect_xy(df: DataFrame | np.ndarray) -> np.ndarray:
    if isinstance(df, DataFrame):
        rows = df.select("x", "y").collect()
        return np.array([[r["x"], r["y"]] for r in rows], dtype=float)
    return np.asarray(df, dtype=float)


def get_transformation_between_landmarks(
    references_coords: DataFrame | np.ndarray,
    moving_coords: DataFrame | np.ndarray,
) -> Affine:
    """Similarity transformation mapping the moving landmarks onto the
    reference landmarks (n >= 3 pairs, same row order).

    Mirrors the reference's logic exactly: fit an *affine* first to
    detect a reflection (negative determinant); if reflected, flip the
    moving points about their x-midline, fit the similarity on the
    flipped set, and return the composition — a similarity alone cannot
    represent a reflection (operations.py:399-437).
    """
    ref_xy = _collect_xy(references_coords)
    mov_xy = _collect_xy(moving_coords)
    if ref_xy.shape != mov_xy.shape or ref_xy.shape[0] < 3:
        raise ValueError("Need >= 3 matched landmark pairs of equal shape")

    homo = np.hstack([mov_xy, np.ones((len(mov_xy), 1))])
    coef, *_ = np.linalg.lstsq(homo, ref_xy, rcond=None)
    det = float(np.linalg.det(coef.T[:2, :2]))

    final: BaseTransformation
    if det < 0:
        m = (mov_xy[:, 0].max() + mov_xy[:, 0].min()) / 2
        flip_m = np.array([[-1.0, 0.0, 2 * m], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        flip = Affine(flip_m, ("x", "y"), ("x", "y"))
        flipped = mov_xy @ flip_m[:2, :2].T + flip_m[:2, 2]
        sim = _umeyama_similarity(flipped, ref_xy)
        final = Sequence([flip, Affine(sim, ("x", "y"), ("x", "y"))])
    else:
        final = Affine(_umeyama_similarity(mov_xy, ref_xy), ("x", "y"), ("x", "y"))
    return Affine(final.to_affine_matrix(("x", "y"), ("x", "y")), ("x", "y"), ("x", "y"))


def align_elements_using_landmarks(
    ds,
    references_coords: DataFrame | np.ndarray,
    moving_coords: DataFrame | np.ndarray,
    reference_element: str,
    moving_element: str,
    reference_coordinate_system: str = "global",
    moving_coordinate_system: str = "global",
    new_coordinate_system: str | None = None,
) -> BaseTransformation:
    """Map ``moving_element`` onto ``reference_element`` via landmark
    pairs (reference: operations.py:446-510): the fitted similarity is
    composed *after* the moving element's existing transform, and both
    elements are optionally registered into ``new_coordinate_system``.
    Returns the moving element's new transformation.
    """
    affine = get_transformation_between_landmarks(references_coords, moving_coords)
    old_moving = ds.get_transformation(moving_element, moving_coordinate_system)
    old_reference = ds.get_transformation(reference_element, reference_coordinate_system)
    new_moving = Sequence([old_moving, affine])
    if new_coordinate_system is not None:
        ds.set_transformation(moving_element, new_coordinate_system, new_moving)
        ds.set_transformation(reference_element, new_coordinate_system, old_reference)
    return new_moving
