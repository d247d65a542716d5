"""Reference-parity transformation accessors operating on the dataset
(reference ``transformations/operations.py``): get/set/remove on an
element's CS map and cross-coordinate-system resolution.
"""

from __future__ import annotations

from spatialdata_spark.transformations.base import BaseTransformation, Identity


def get_transformation(ds, element: str, to_coordinate_system: str = "global", get_all: bool = False):
    """Transformation of ``element`` into a coordinate system, or the
    whole CS map with ``get_all=True`` (reference
    ``operations.py:105-160``)."""
    cs_map = ds.transforms.get(element)
    if cs_map is None:
        raise KeyError(f"element {element!r} has no transformations")
    if get_all:
        return dict(cs_map)
    if to_coordinate_system not in cs_map:
        raise ValueError(f"element {element!r} has no transformation to {to_coordinate_system!r}")
    return cs_map[to_coordinate_system]


def set_transformation(ds, element: str, transformation: BaseTransformation, to_coordinate_system: str = "global") -> None:
    """Set/replace one CS edge of an element (reference ``operations.py:24-102``)."""
    ds.transforms.setdefault(element, {})[to_coordinate_system] = transformation


def remove_transformation(ds, element: str, to_coordinate_system: str = "global") -> None:
    """Remove one CS edge (reference ``operations.py:163-193``)."""
    cs_map = ds.transforms.get(element)
    if not cs_map or to_coordinate_system not in cs_map:
        raise ValueError(f"element {element!r} has no transformation to {to_coordinate_system!r}")
    del cs_map[to_coordinate_system]


def remove_transformations_to_coordinate_system(ds, coordinate_system: str) -> None:
    """Drop a coordinate system from every element (reference
    ``operations.py`` same-named helper)."""
    for cs_map in ds.transforms.values():
        cs_map.pop(coordinate_system, None)


def get_transformation_between_coordinate_systems(ds, source, target) -> BaseTransformation:
    """Shortest-path transformation between two nodes of the bipartite
    element/CS graph (reference ``operations.py:196-344``).  Nodes are
    element names or coordinate-system names; identical nodes give
    Identity."""
    from spatialdata_spark.transformations.graph import get_transformation_between

    if source == target:
        return Identity()
    src_kw = {"source_element": source} if source in ds.transforms else {"source_cs": source}
    dst_kw = {"target_element": target} if target in ds.transforms else {"target_cs": target}
    return get_transformation_between(ds.transforms, **src_kw, **dst_kw)
