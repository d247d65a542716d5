"""Coordinate-system graph resolution.

Elements and named coordinate systems form a bipartite graph whose edges
are transformations (with auto-added inverses); resolving a transform
between two nodes is a shortest-path search (reference:
src/spatialdata/transformations/operations.py:196-344).  The graphs are
tiny (tens of nodes), so this is pure driver-side Python over networkx.
"""

from __future__ import annotations

import numpy as np

from spatialdata_spark.transformations.base import (
    Affine,
    BaseTransformation,
    Identity,
    Sequence,
)


class _ElementNode:
    """Graph node for an element (distinct from same-named CS strings)."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __hash__(self):
        return hash(("__element__", self.name))

    def __eq__(self, other):
        return isinstance(other, _ElementNode) and self.name == other.name

    def __repr__(self):
        return f"Element({self.name})"


def build_transform_graph(transforms: dict[str, dict[str, BaseTransformation]]):
    """transforms: element name -> {coordinate system name -> transformation}."""
    import networkx as nx

    g = nx.DiGraph()
    for element, cs_map in transforms.items():
        e_node = _ElementNode(element)
        for cs, t in cs_map.items():
            g.add_edge(e_node, cs, transformation=t)
            try:
                g.add_edge(cs, e_node, transformation=t.inverse())
            except (ValueError, np.linalg.LinAlgError):
                pass  # non-invertible edge: one-directional
    return g


def get_transformation_between(
    transforms: dict[str, dict[str, BaseTransformation]],
    source_element: str | None = None,
    source_cs: str | None = None,
    target_cs: str | None = None,
    target_element: str | None = None,
) -> BaseTransformation:
    """Resolve the composed transformation between two graph nodes.

    Shortest path (fewest hops) wins, mirroring the reference's
    disambiguation.  Raises if no path exists.
    """
    import networkx as nx

    g = build_transform_graph(transforms)
    src = _ElementNode(source_element) if source_element is not None else source_cs
    dst = _ElementNode(target_element) if target_element is not None else target_cs
    if src is None or dst is None:
        raise ValueError("Both a source and a target must be given.")
    if src == dst:
        return Identity()
    try:
        path = nx.shortest_path(g, src, dst)
    except (nx.NetworkXNoPath, nx.NodeNotFound) as e:
        raise ValueError(f"No transformation path between {src!r} and {dst!r}") from e
    steps = [g.edges[a, b]["transformation"] for a, b in zip(path[:-1], path[1:])]
    if len(steps) == 1:
        return steps[0]
    return Sequence(steps)


def estimate_affine_from_landmarks(
    moving: np.ndarray, reference: np.ndarray, axes: tuple[str, ...] = ("x", "y")
) -> Affine:
    """Least-squares affine mapping ``moving`` -> ``reference`` point sets.

    Requires >= 3 non-collinear point pairs (reference:
    transformations/operations.py:347-510 uses skimage's similarity /
    affine estimation; we solve the normal equations directly).
    """
    moving = np.asarray(moving, dtype=float)
    reference = np.asarray(reference, dtype=float)
    if moving.shape != reference.shape or moving.shape[0] < 3:
        raise ValueError("Need >=3 matched landmark pairs of equal shape")
    n, d = moving.shape
    homo = np.hstack([moving, np.ones((n, 1))])
    # solve homo @ A.T = reference for A (d x (d+1))
    coef, *_ = np.linalg.lstsq(homo, reference, rcond=None)
    a = coef.T  # (d, d+1)
    return Affine.from_linear(a[:, :d], a[:, d], axes, axes)
