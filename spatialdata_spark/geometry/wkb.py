"""Minimal pure-numpy WKB codec for Point / Polygon / MultiPolygon.

The reference stores shapes as GeoDataFrames serialized to GeoParquet
with WKB geometry (reference: src/spatialdata/_io/io_shapes.py:152-183).
shapely is not available in this image, so we implement the small WKB
subset the engine needs: 2-D Point (type 1), Polygon (type 3) and
MultiPolygon (type 6), little-endian, no SRID.

Geometries decode to plain numpy: a Point -> shape (2,) array; a
Polygon -> list of rings, each an (n, 2) array (first ring = exterior);
a MultiPolygon -> list of polygons.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_POLYGON = 3
_MULTIPOLYGON = 6


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def encode_multipolygon(polygons: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


def _read_ring(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return pts, off + 16 * n


def _read_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off)
        rings.append(ring)
    return rings, off


def decode(buf: bytes):
    """Decode WKB -> ("point", xy) | ("polygon", rings) | ("multipolygon", [rings...])."""
    geom, _ = _decode_at(buf, 0)
    return geom


def _decode_at(buf: bytes, off: int):
    byte_order, gtype = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:
        raise ValueError("Only little-endian WKB supported")
    gtype &= 0xFF  # strip any Z/M/SRID flags callers shouldn't send
    off += 5
    if gtype == _POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return ("point", np.array([x, y])), off + 16
    if gtype == _POLYGON:
        rings, off = _read_polygon_body(buf, off)
        return ("polygon", rings), off
    if gtype == _MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(n):
            (geom, off2) = _decode_at(buf, off)
            if geom[0] != "polygon":
                raise ValueError("MultiPolygon member is not a polygon")
            polys.append(geom[1])
            off = off2
        return ("multipolygon", polys), off
    raise ValueError(f"Unsupported WKB geometry type {gtype}")


def geometry_kind(buf: bytes) -> str:
    gtype = struct.unpack_from("<BI", buf, 0)[1] & 0xFF
    return {_POINT: "point", _POLYGON: "polygon", _MULTIPOLYGON: "multipolygon"}[gtype]


def regular_polygon(cx: float, cy: float, radius: float, n: int = 32) -> np.ndarray:
    """Approximate a circle as an n-gon ring (circle.buffer analog)."""
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.column_stack([cx + radius * np.cos(theta), cy + radius * np.sin(theta)])
