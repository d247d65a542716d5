"""Affine matrices as Catalyst column expressions.

The reference applies affines to point coordinates with a dask
``map_partitions`` (reference: src/spatialdata/_core/operations/
transform.py:429-503).  On Spark the matrices are tiny driver-side
constants, so we emit them as *column expressions* —
``x' = m00*x + m01*y + tx`` — which stay inside whole-stage codegen,
fold constants, and keep range predicates over the outputs eligible
for pushdown.  No UDF, no Python boundary.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spatialdata_spark.transformations import BaseTransformation, get_output_axes


def affine_exprs(
    matrix: np.ndarray, input_axes: tuple[str, ...], output_axes: tuple[str, ...]
) -> dict[str, Column]:
    """Output-axis name -> linear-combination Column over input-axis columns.

    Zero terms and unit factors are elided so an identity row degrades to
    a bare column reference (Catalyst sees through it either way; this
    keeps ``explain`` output readable).
    """
    out: dict[str, Column] = {}
    for i_out, ax_out in enumerate(output_axes):
        expr: Column | None = None
        for i_in, ax_in in enumerate(input_axes):
            coef = float(matrix[i_out, i_in])
            if coef == 0.0:
                continue
            term = F.col(ax_in) if coef == 1.0 else F.col(ax_in) * F.lit(coef)
            expr = term if expr is None else expr + term
        t = float(matrix[i_out, -1])
        if t != 0.0 or expr is None:
            expr = F.lit(t) if expr is None else expr + F.lit(t)
        out[ax_out] = expr
    return out


def apply_affine(
    df: DataFrame,
    transformation: BaseTransformation,
    axes: tuple[str, ...] | None = None,
    output_axes: tuple[str, ...] | None = None,
) -> DataFrame:
    """Apply a transformation to a points DataFrame's coordinate columns.

    Non-coordinate columns pass through untouched.  The output keeps the
    canonical ``x, y[, z]`` ordering regardless of the transformation's
    natural output order.
    """
    if axes is None:
        axes = ("x", "y", "z") if "z" in df.columns else ("x", "y")
    if output_axes is None:
        derived = get_output_axes(transformation, axes)
        output_axes = tuple(ax for ax in ("x", "y", "z") if ax in derived)
    m = transformation.to_affine_matrix(axes, output_axes)
    exprs = affine_exprs(m, axes, output_axes)
    keep = [c for c in df.columns if c not in axes]
    return df.select(
        *[exprs[ax].alias(ax) for ax in output_axes],
        *[F.col(c) for c in keep],
    )
