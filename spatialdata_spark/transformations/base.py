"""Coordinate transformations: axis-aware affine algebra.

Re-implements the semantics of the reference transformation hierarchy
(reference: src/spatialdata/transformations/transformations.py:190-802 —
Identity :190, MapAxis :242, Translation :343, Scale :430, Affine :509,
Sequence :626) as plain numpy on the driver.  Matrices are tiny (at most
5x5 homogeneous), so none of this touches Spark; operators *emit* these
matrices as Catalyst column expressions (see operators/transform.py).

Conventions (matching the reference):

* The axis universe is ``{c, z, y, x}``.
* ``to_affine_matrix(input_axes, output_axes)`` materializes a
  ``(len(output_axes)+1, len(input_axes)+1)`` homogeneous matrix mapping
  column vectors ``(in..., 1)`` to ``(out..., 1)``.
* ``MapAxis({out_ax: in_ax})`` maps output axes from input axes
  (the reference repr prints ``out <- in``).
* ``Sequence`` threads axes through its steps: each step's output axes
  (per :func:`get_output_axes`) become the next step's input axes.
"""

from __future__ import annotations

import math
from numbers import Number

import numpy as np

VALID_AXES = ("c", "z", "y", "x")


def validate_axes(axes: tuple[str, ...]) -> None:
    if len(set(axes)) != len(axes):
        raise ValueError(f"Axes must be unique, got {axes}")
    for ax in axes:
        if ax not in VALID_AXES:
            raise ValueError(f"Invalid axis {ax!r}; valid axes are {VALID_AXES}")


def _as_float_array(v) -> np.ndarray:
    a = np.asarray(v, dtype=float)
    return a


class BaseTransformation:
    """Abstract transformation between named coordinate systems."""

    def to_affine_matrix(self, input_axes: tuple[str, ...], output_axes: tuple[str, ...]) -> np.ndarray:
        raise NotImplementedError

    def inverse(self) -> "BaseTransformation":
        raise NotImplementedError

    def compose_with(self, other: "BaseTransformation") -> "BaseTransformation":
        """self then other (function composition other∘self)."""
        parts: list[BaseTransformation] = []
        for t in (self, other):
            if isinstance(t, Sequence):
                parts.extend(t.transformations)
            else:
                parts.append(t)
        return Sequence(parts)

    def _empty_matrix(self, input_axes: tuple[str, ...], output_axes: tuple[str, ...]) -> np.ndarray:
        m = np.zeros((len(output_axes) + 1, len(input_axes) + 1))
        m[-1, -1] = 1.0
        return m

    def transform_coordinates(self, coords: np.ndarray, axes: tuple[str, ...]) -> np.ndarray:
        """Apply to an (n, d) coordinate array whose columns are ``axes``."""
        out_axes = get_output_axes(self, axes)
        m = self.to_affine_matrix(axes, out_axes)
        homo = np.hstack([coords, np.ones((coords.shape[0], 1))])
        return (m @ homo.T).T[:, :-1]

    def to_dict(self) -> dict:
        raise NotImplementedError

    @staticmethod
    def from_dict(d: dict) -> "BaseTransformation":
        kind = d["type"]
        if kind == "identity":
            return Identity()
        if kind == "map_axis":
            return MapAxis(dict(d["map_axis"]))
        if kind == "translation":
            return Translation(d["translation"], tuple(d["axes"]))
        if kind == "scale":
            return Scale(d["scale"], tuple(d["axes"]))
        if kind == "affine":
            return Affine(np.array(d["matrix"]), tuple(d["input_axes"]), tuple(d["output_axes"]))
        if kind == "sequence":
            return Sequence([BaseTransformation.from_dict(t) for t in d["transformations"]])
        raise ValueError(f"Unknown transformation type {kind!r}")

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.to_dict()})"


class Identity(BaseTransformation):
    """Identity (reference transformations.py:190)."""

    def to_affine_matrix(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        if not set(input_axes) <= set(output_axes):
            raise ValueError("Input axes must be a subset of output axes.")
        m = self._empty_matrix(input_axes, output_axes)
        for i_out, ax_out in enumerate(output_axes):
            for i_in, ax_in in enumerate(input_axes):
                if ax_in == ax_out:
                    m[i_out, i_in] = 1.0
        return m

    def inverse(self):
        return self

    def to_dict(self):
        return {"type": "identity"}

    def __eq__(self, other):
        return isinstance(other, Identity)


class MapAxis(BaseTransformation):
    """Axis permutation / rename / duplication.

    ``map_axis`` maps output axis -> source input axis (``out <- in``).
    Reference: transformations.py:242-341.
    """

    def __init__(self, map_axis: dict[str, str]):
        for k, v in map_axis.items():
            validate_axes((k,))
            validate_axes((v,))
        self.map_axis = dict(map_axis)

    def to_affine_matrix(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        for ax in output_axes:
            if ax in self.map_axis and self.map_axis[ax] not in input_axes:
                raise ValueError(f"Output axis {ax!r} maps from {self.map_axis[ax]!r} which is not in input_axes.")
        for ax in input_axes:
            if ax not in self.map_axis.values() and ax not in output_axes:
                raise ValueError(f"Input axis {ax!r} is not consumed by the map and missing from output_axes.")
        m = self._empty_matrix(input_axes, output_axes)
        for i_out, ax_out in enumerate(output_axes):
            for i_in, ax_in in enumerate(input_axes):
                if ax_out in self.map_axis:
                    if self.map_axis[ax_out] == ax_in:
                        m[i_out, i_in] = 1.0
                elif ax_in == ax_out:
                    m[i_out, i_in] = 1.0
        return m

    def inverse(self):
        if len(set(self.map_axis.values())) != len(self.map_axis):
            raise ValueError("Cannot invert a non-injective MapAxis.")
        return MapAxis({v: k for k, v in self.map_axis.items()})

    def to_dict(self):
        return {"type": "map_axis", "map_axis": dict(self.map_axis)}

    def __eq__(self, other):
        return isinstance(other, MapAxis) and self.map_axis == other.map_axis


class Translation(BaseTransformation):
    """Per-axis translation (reference transformations.py:343)."""

    def __init__(self, translation, axes: tuple[str, ...]):
        self.translation = _as_float_array(translation)
        validate_axes(tuple(axes))
        self.axes = tuple(axes)
        if len(self.translation) != len(self.axes):
            raise ValueError("translation and axes length mismatch")

    def to_vector(self, axes: tuple[str, ...]) -> np.ndarray:
        return np.array([self.translation[self.axes.index(ax)] if ax in self.axes else 0.0 for ax in axes])

    def to_affine_matrix(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        if not set(input_axes) <= set(output_axes):
            raise ValueError("Input axes must be a subset of output axes.")
        m = self._empty_matrix(input_axes, output_axes)
        for i_out, ax_out in enumerate(output_axes):
            for i_in, ax_in in enumerate(input_axes):
                if ax_in == ax_out:
                    m[i_out, i_in] = 1.0
                    if ax_out in self.axes:
                        m[i_out, -1] = self.translation[self.axes.index(ax_out)]
        return m

    def inverse(self):
        return Translation(-self.translation, self.axes)

    def to_dict(self):
        return {"type": "translation", "translation": self.translation.tolist(), "axes": list(self.axes)}

    def __eq__(self, other):
        return (
            isinstance(other, Translation)
            and self.axes == other.axes
            and np.allclose(self.translation, other.translation)
        )


class Scale(BaseTransformation):
    """Per-axis scaling (reference transformations.py:430)."""

    def __init__(self, scale, axes: tuple[str, ...]):
        self.scale = _as_float_array(scale)
        validate_axes(tuple(axes))
        self.axes = tuple(axes)
        if len(self.scale) != len(self.axes):
            raise ValueError("scale and axes length mismatch")

    def to_vector(self, axes: tuple[str, ...]) -> np.ndarray:
        return np.array([self.scale[self.axes.index(ax)] if ax in self.axes else 1.0 for ax in axes])

    def to_affine_matrix(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        if not set(input_axes) <= set(output_axes):
            raise ValueError("Input axes must be a subset of output axes.")
        m = self._empty_matrix(input_axes, output_axes)
        for i_out, ax_out in enumerate(output_axes):
            for i_in, ax_in in enumerate(input_axes):
                if ax_in == ax_out:
                    m[i_out, i_in] = self.scale[self.axes.index(ax_out)] if ax_out in self.axes else 1.0
        return m

    def inverse(self):
        return Scale(1.0 / self.scale, self.axes)

    def to_dict(self):
        return {"type": "scale", "scale": self.scale.tolist(), "axes": list(self.axes)}

    def __eq__(self, other):
        return isinstance(other, Scale) and self.axes == other.axes and np.allclose(self.scale, other.scale)


class Affine(BaseTransformation):
    """Full homogeneous affine with named input/output axes.

    Reference: transformations.py:509-624.  ``matrix`` has shape
    ``(len(output_axes)+1, len(input_axes)+1)`` with last row
    ``[0,...,0,1]``.
    """

    def __init__(self, matrix, input_axes: tuple[str, ...], output_axes: tuple[str, ...]):
        validate_axes(tuple(input_axes))
        validate_axes(tuple(output_axes))
        self.input_axes = tuple(input_axes)
        self.output_axes = tuple(output_axes)
        self.matrix = _as_float_array(matrix)
        if self.matrix.shape != (len(self.output_axes) + 1, len(self.input_axes) + 1):
            raise ValueError(
                f"Invalid affine matrix shape {self.matrix.shape}; expected "
                f"({len(self.output_axes) + 1}, {len(self.input_axes) + 1})"
            )
        if not np.allclose(self.matrix[-1, :-1], 0.0) or not math.isclose(self.matrix[-1, -1], 1.0):
            raise ValueError("Affine matrix must be homogeneous (last row [0,...,0,1]).")

    def to_affine_matrix(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        for ax in input_axes:
            if ax not in self.input_axes and ax in self.output_axes:
                raise ValueError(
                    f"Axis {ax!r} is not an input of this affine but appears as one of its outputs; "
                    "remove it from input_axes."
                )
        m = self._empty_matrix(input_axes, output_axes)
        for i_out, ax_out in enumerate(output_axes):
            if ax_out in self.output_axes:
                j_out = self.output_axes.index(ax_out)
                m[i_out, -1] = self.matrix[j_out, -1]
                for i_in, ax_in in enumerate(input_axes):
                    if ax_in in self.input_axes:
                        j_in = self.input_axes.index(ax_in)
                        m[i_out, i_in] = self.matrix[j_out, j_in]
            else:
                # passthrough axis untouched by the affine
                for i_in, ax_in in enumerate(input_axes):
                    if ax_in == ax_out:
                        m[i_out, i_in] = 1.0
        return m

    def inverse(self):
        if len(self.input_axes) != len(self.output_axes):
            raise ValueError("Only square affines are invertible.")
        return Affine(np.linalg.inv(self.matrix), self.output_axes, self.input_axes)

    def to_dict(self):
        return {
            "type": "affine",
            "matrix": self.matrix.tolist(),
            "input_axes": list(self.input_axes),
            "output_axes": list(self.output_axes),
        }

    def __eq__(self, other):
        return (
            isinstance(other, Affine)
            and self.input_axes == other.input_axes
            and self.output_axes == other.output_axes
            and np.allclose(self.matrix, other.matrix)
        )

    @staticmethod
    def from_linear(linear: np.ndarray, translation, input_axes, output_axes) -> "Affine":
        linear = _as_float_array(linear)
        t = _as_float_array(translation)
        m = np.zeros((linear.shape[0] + 1, linear.shape[1] + 1))
        m[:-1, :-1] = linear
        m[:-1, -1] = t
        m[-1, -1] = 1.0
        return Affine(m, input_axes, output_axes)


class Sequence(BaseTransformation):
    """Composition of transformations, applied first-to-last.

    Reference: transformations.py:626-757.  Axes are threaded through
    the steps; the final matrix is reordered/padded to the requested
    output axes.
    """

    def __init__(self, transformations: list[BaseTransformation]):
        if not transformations:
            raise ValueError("Sequence needs at least one transformation")
        self.transformations = list(transformations)

    def _matrix_and_axes(self, input_axes, output_axes):
        validate_axes(input_axes)
        validate_axes(output_axes)
        if not set(input_axes) <= set(output_axes):
            raise ValueError("Input axes must be a subset of output axes.")
        cur_in = tuple(input_axes)
        cur_out = get_output_axes(self.transformations[0], cur_in)
        m = self.transformations[0].to_affine_matrix(cur_in, cur_out)
        for t in self.transformations[1:]:
            cur_in = cur_out
            cur_out = get_output_axes(t, cur_in)
            if isinstance(t, Sequence):
                lhs, cur_out = t._matrix_and_axes(cur_in, cur_out)
            else:
                lhs = t.to_affine_matrix(cur_in, cur_out)
            m = lhs @ m
        return m, cur_out

    def to_affine_matrix(self, input_axes, output_axes):
        m, cur_out = self._matrix_and_axes(input_axes, output_axes)
        if tuple(cur_out) != tuple(output_axes):
            rows = []
            for ax in output_axes:
                if ax in cur_out:
                    rows.append(m[cur_out.index(ax), :])
                else:
                    rows.append(np.zeros(m.shape[1]))
            rows.append(m[-1, :])
            m = np.array(rows)
        return m

    def inverse(self):
        return Sequence([t.inverse() for t in reversed(self.transformations)])

    def to_dict(self):
        return {"type": "sequence", "transformations": [t.to_dict() for t in self.transformations]}

    def __eq__(self, other):
        return isinstance(other, Sequence) and self.transformations == other.transformations


def get_output_axes(transformation: BaseTransformation, input_axes: tuple[str, ...]) -> tuple[str, ...]:
    """Output axes a transformation produces for given input axes.

    Reference: transformations.py:759-802 (``_get_current_output_axes``).
    """
    if isinstance(transformation, (Identity, Translation, Scale)):
        return tuple(input_axes)
    if isinstance(transformation, MapAxis):
        consumed = set(transformation.map_axis.values())
        out: list[str] = []
        for ax in input_axes:
            if ax not in consumed:
                out.append(ax)
            else:
                out.extend(ax_out for ax_out, ax_in in transformation.map_axis.items() if ax_in == ax)
        return tuple(out)
    if isinstance(transformation, Affine):
        out = []
        touched = False
        for ax in input_axes:
            if ax not in transformation.input_axes:
                out.append(ax)
            else:
                touched = True
        if touched:
            for ax in transformation.output_axes:
                if ax in out:
                    raise ValueError(f"Axis {ax!r} is both a passthrough input and an affine output.")
                out.append(ax)
        return tuple(out)
    if isinstance(transformation, Sequence):
        axes = tuple(input_axes)
        for t in transformation.transformations:
            axes = get_output_axes(t, axes)
        return axes
    raise ValueError(f"Unknown transformation type {type(transformation)}")


def scale_radii_factor(transformation: BaseTransformation, spatial_axes: tuple[str, ...] = ("x", "y")) -> float:
    """Isotropic radius rescale factor = mean of per-axis linear scale norms.

    Mirrors the reference's circle-radius rescaling under affines
    (reference: transformations/_utils.py:232-265 ``scale_radii``):
    radius' = radius * mean_i(||column_i of linear part||).
    """
    m = transformation.to_affine_matrix(spatial_axes, spatial_axes)
    linear = m[:-1, :-1]
    norms = np.linalg.norm(linear, axis=0)
    return float(np.mean(norms))


def decompose_affine(
    transformation: BaseTransformation, axes: tuple[str, ...] = ("x", "y")
) -> Sequence:
    """Decompose a square affine into
    ``Sequence([scale, shear, reflection, rotation, translation])``
    (applied first-to-last), via QR factorization of the linear part.

    Mirrors the reference's RQ-based decomposition into
    reflection/rotation/shear/scale/translation components
    (reference: transformations/transformations.py:837-966).  Component
    properties: ``scale`` has positive entries; ``shear`` is
    upper-triangular with unit diagonal; ``reflection`` is ``±1`` on the
    first axis only; ``rotation`` is orthogonal with determinant ``+1``.
    Composing the returned sequence over ``axes`` reproduces the input
    matrix exactly (up to float round-off).

    Driver-side math on tiny matrices — never touches a DataFrame.
    """
    m = transformation.to_affine_matrix(axes, axes)
    linear = m[:-1, :-1]
    translation = m[:-1, -1]
    if abs(float(np.linalg.det(linear))) < 1e-12:
        raise ValueError("Affine is singular; decomposition requires an invertible linear part.")
    q, r = np.linalg.qr(linear)
    # fold signs so the triangular factor has a positive diagonal
    d = np.sign(np.diag(r))
    d[d == 0] = 1.0
    q = q * d[None, :]
    r = r * d[:, None]
    scale = np.diag(r).copy()
    shear = r / scale[None, :]  # R = shear @ diag(scale): divide columns
    refl = np.ones(len(axes))
    if np.linalg.det(q) < 0:
        refl[0] = -1.0
        q = q * refl[None, :]  # q := q @ diag(refl); refl then restores the sign
    zero_t = np.zeros(len(axes))
    return Sequence(
        [
            Scale(scale, axes),
            Affine.from_linear(shear, zero_t, axes, axes),
            Scale(refl, axes),
            Affine.from_linear(q, zero_t, axes, axes),
            Translation(translation, axes),
        ]
    )
