"""Raster/vector conversion: to_circles, to_polygons.

Reference: src/spatialdata/_core/operations/vectorize.py —
to_circles :38-156 (equal-area circles from labels/polygons),
to_polygons :159-302 (per-chunk contours + cross-chunk dissolve).
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def labels_to_circles(labels_long: DataFrame, pixel_area: float = 1.0) -> DataFrame:
    """Equal-area circle per label: area = pixel count, center = centroid,
    radius = sqrt(area/pi) (reference: vectorize.py:38-156).  One
    groupBy — the plan the reference needs dask ones-aggregation for."""
    return (
        labels_long.filter(F.col("label") != 0)
        .groupBy("label")
        .agg(
            F.avg("x").alias("x"),
            F.avg("y").alias("y"),
            (F.count(F.lit(1)) * F.lit(float(pixel_area))).alias("area"),
        )
        .select(
            F.col("label").alias("shape_id"),
            "x",
            "y",
            F.sqrt(F.col("area") / F.lit(math.pi)).alias("radius"),
        )
    )


# module-level: a pandas_udf created inside the operator re-pickles and
# re-registers the function on every plan construction (~30-50 ms)
@F.pandas_udf(T.DoubleType())
def _area(wkb_s):
    import pandas as pd

    from spatialdata_spark.geometry import predicates as P
    from spatialdata_spark.geometry import wkb as W

    out = []
    for buf in wkb_s:
        kind, geom = W.decode(bytes(buf))
        if kind == "point":
            out.append(float("nan"))
        elif kind == "polygon":
            out.append(P.polygon_area(geom))
        else:
            out.append(P.multipolygon_area(geom))
    return pd.Series(out)


def shapes_to_circles(shapes: DataFrame) -> DataFrame:
    """Polygons -> equal-area circles at their centroid; circles pass
    through (reference: vectorize.py:38-120)."""
    from spatialdata_spark.operators.measures import centroids_shapes

    cent = centroids_shapes(shapes)
    areas = shapes.select(
        F.col("shape_id").alias("instance_id"),
        F.col("kind"),
        F.col("radius"),
        _area(F.col("wkb")).alias("area"),
    )
    joined = cent.join(areas, "instance_id")
    return joined.select(
        F.col("instance_id").alias("shape_id"),
        "x",
        "y",
        F.when(F.col("kind") == "point", F.col("radius"))
        .otherwise(F.sqrt(F.col("area") / F.lit(math.pi)))
        .alias("radius"),
    )


@lru_cache(maxsize=16)
def _ngon_udf(n_vertices: int):
    @F.pandas_udf(T.BinaryType())
    def _ngon(x_s, y_s, r_s):
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        return pd.Series(
            [
                W.encode_polygon([W.regular_polygon(float(x), float(y), float(r), n_vertices)])
                for x, y, r in zip(x_s, y_s, r_s)
            ]
        )

    return _ngon


def circles_to_polygon_shapes(circles: DataFrame, n_vertices: int = 32) -> DataFrame:
    """Circles -> n-gon polygon shapes (`buffer()` analog,
    reference: vectorize.py:270-302)."""
    _ngon = _ngon_udf(n_vertices)

    return circles.select(
        "shape_id",
        F.lit("polygon").alias("kind"),
        _ngon("x", "y", "radius").alias("wkb"),
        (F.col("x") - F.col("radius")).alias("minx"),
        (F.col("y") - F.col("radius")).alias("miny"),
        (F.col("x") + F.col("radius")).alias("maxx"),
        (F.col("y") + F.col("radius")).alias("maxy"),
        F.lit(None).cast("double").alias("radius"),
    )


# module-level UDFs: creating a pandas_udf wrapper per call re-pickles
# the function and re-registers the JVM UDF on every plan construction
# (~50ms each); a module singleton pays that once per process
@F.pandas_udf(T.BinaryType())
def _pt_wkb_udf(x_s, y_s):
    import pandas as pd

    from spatialdata_spark.geometry import wkb as W

    return pd.Series([W.encode_point(float(x), float(y)) for x, y in zip(x_s, y_s)])


@F.pandas_udf(T.BinaryType())
def _rect_wkb_udf(minx_s, miny_s, maxx_s, maxy_s):
    import numpy as np
    import pandas as pd

    from spatialdata_spark.geometry import wkb as W

    return pd.Series(
        [
            W.encode_polygon([np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)])
            for x0, y0, x1, y1 in zip(minx_s, miny_s, maxx_s, maxy_s)
        ]
    )


def circles_to_shapes(circles: DataFrame) -> DataFrame:
    """(shape_id, x, y, radius) -> canonical shapes schema rows of kind
    'point' with bbox padded by radius."""
    _pt = _pt_wkb_udf

    return circles.select(
        "shape_id",
        F.lit("point").alias("kind"),
        _pt("x", "y").alias("wkb"),
        (F.col("x") - F.col("radius")).alias("minx"),
        (F.col("y") - F.col("radius")).alias("miny"),
        (F.col("x") + F.col("radius")).alias("maxx"),
        (F.col("y") + F.col("radius")).alias("maxy"),
        "radius",
    )


def boxes_to_shapes(df: DataFrame, id_col: str = "shape_id") -> DataFrame:
    """(id, minx, miny, maxx, maxy) -> canonical shapes rows with
    rectangle polygon WKB.

    kind='box' lets downstream operators (grid join refine, fraction
    weighting) use pure rectangle expressions instead of geometry UDFs;
    the WKB polygon is still present for generic consumers.
    """
    _rect = _rect_wkb_udf

    return df.select(
        F.col(id_col).alias("shape_id"),
        F.lit("box").alias("kind"),
        _rect("minx", "miny", "maxx", "maxy").alias("wkb"),
        F.col("minx").cast("double").alias("minx"),
        F.col("miny").cast("double").alias("miny"),
        F.col("maxx").cast("double").alias("maxx"),
        F.col("maxy").cast("double").alias("maxy"),
        F.lit(None).cast("double").alias("radius"),
    )


def labels_tiles_to_polygons(label_tiles: DataFrame, meta) -> DataFrame:
    """Exact label -> polygon vectorization from the tile layer
    (reference: vectorize.py:159-302 — per-chunk contours + cross-chunk
    dissolve).

    Plan: a 5-way neighbor-contribution join gives each tile a 1-pixel
    halo; boundary **unit edges** (pixel sides whose 4-neighbor has a
    different label) are emitted per tile, oriented interior-left so
    exterior rings come out CCW and holes CW; one groupBy(label)
    assembles edges into closed rings by leftmost-turn walking and
    nests holes into their containing exteriors.  Work per label is
    O(perimeter) — the dissolve never materializes pixel sets.
    """
    ts = meta.tile
    dtype = meta.dtype

    # the 5 neighbor offsets as ONE selectExpr parse (the struct-array
    # Column build cost ~12 py4j round trips per construction)
    offs = ", ".join(
        f"named_struct('dy', {dy}, 'dx', {dx})"
        for dy, dx in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
    )
    contrib = (
        label_tiles.where("scale = 0")
        .selectExpr("ty", "tx", "tile", f"explode(array({offs})) AS off")
        .selectExpr(
            "(ty + off.dy) AS gty",
            "(tx + off.dx) AS gtx",
            "off.dy AS rel_dy",
            "off.dx AS rel_dx",
            "tile",
        )
        .where("(gty >= 0) AND (gtx >= 0)")
    )

    from spatialdata_spark.operators.raster import _apply_in_pandas_cached

    edges = _apply_in_pandas_cached(contrib.groupBy("gty", "gtx"), _edges_udf(ts, dtype))
    return _apply_in_pandas_cached(edges.groupBy("label"), _tile_assemble_udf())


_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("label", T.LongType()),
        T.StructField("x0", T.LongType()),
        T.StructField("y0", T.LongType()),
        T.StructField("x1", T.LongType()),
        T.StructField("y1", T.LongType()),
    ]
)


@lru_cache(maxsize=64)
def _edges_udf(ts: int, dtype: str):
    def _edges(key, pdf):
        import numpy as np
        import pandas as pd

        gty, gtx = int(key[0]), int(key[1])
        padded = np.zeros((ts + 2, ts + 2), dtype=np.dtype(dtype))
        center_seen = False
        for row in pdf.itertuples(index=False):
            a = np.frombuffer(row.tile, dtype=np.dtype(dtype)).reshape(ts, ts)
            dy, dx = int(row.rel_dy), int(row.rel_dx)
            if dy == 0 and dx == 0:
                center_seen = True
            y0 = 1 - dy * ts
            x0 = 1 - dx * ts
            ys0, ys1 = max(0, y0), min(ts + 2, y0 + ts)
            xs0, xs1 = max(0, x0), min(ts + 2, x0 + ts)
            if ys0 >= ys1 or xs0 >= xs1:
                continue
            padded[ys0:ys1, xs0:xs1] = a[ys0 - y0 : ys1 - y0, xs0 - x0 : xs1 - x0]
        if not center_seen:
            return pd.DataFrame(columns=["label", "x0", "y0", "x1", "y1"])
        core = padded[1:-1, 1:-1]
        m = core != 0
        oy, ox = gty * ts, gtx * ts
        frames = []
        # (neighbor slice, edge endpoints as fn of pixel (y, x))
        sides = [
            (padded[:-2, 1:-1], lambda y, x: (x, y, x + 1, y)),          # y-1 differs
            (padded[1:-1, 2:], lambda y, x: (x + 1, y, x + 1, y + 1)),   # x+1 differs
            (padded[2:, 1:-1], lambda y, x: (x + 1, y + 1, x, y + 1)),   # y+1 differs
            (padded[1:-1, :-2], lambda y, x: (x, y + 1, x, y)),          # x-1 differs
        ]
        for nb, mk in sides:
            yy, xx = np.nonzero(m & (nb != core))
            if len(yy) == 0:
                continue
            gx, gy = xx + ox, yy + oy
            x0e, y0e, x1e, y1e = mk(gy, gx)
            frames.append(
                pd.DataFrame(
                    {"label": core[yy, xx].astype(np.int64), "x0": x0e, "y0": y0e, "x1": x1e, "y1": y1e}
                )
            )
        if not frames:
            return pd.DataFrame(columns=["label", "x0", "y0", "x1", "y1"])
        return pd.concat(frames)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.util import PythonEvalType

    return pandas_udf(_edges, returnType=_EDGE_SCHEMA, functionType=PythonEvalType.SQL_GROUPED_MAP_PANDAS_UDF)


_SHAPES_SCHEMA = T.StructType(
    [
        T.StructField("shape_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("wkb", T.BinaryType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("radius", T.DoubleType()),
    ]
)


# turn preference when several edges leave a vertex (checkerboard
# corner): leftmost turn keeps each component's boundary separate
def _walk_rings(ex0, ey0, ex1, ey1):
        import numpy as np

        out_map: dict = {}
        for i in range(len(ex0)):
            out_map.setdefault((int(ex0[i]), int(ey0[i])), []).append((int(ex1[i]), int(ey1[i])))
        for v in out_map.values():
            v.sort()
        rings = []
        starts = sorted(out_map)
        for s in starts:
            while out_map.get(s):
                ring = [s]
                cur = s
                nxt = out_map[s].pop()
                while nxt != s:
                    ring.append(nxt)
                    dx, dy = nxt[0] - cur[0], nxt[1] - cur[1]
                    cands = out_map.get(nxt, [])
                    if len(cands) == 1:
                        chosen = cands.pop()
                    else:
                        # prefer left turn, then straight, then right
                        pref = [(-dy, dx), (dx, dy), (dy, -dx)]
                        chosen = None
                        for pdx, pdy in pref:
                            want = (nxt[0] + pdx, nxt[1] + pdy)
                            if want in cands:
                                cands.remove(want)
                                chosen = want
                                break
                        if chosen is None:
                            chosen = cands.pop()
                    cur, nxt = nxt, chosen
                ring.append(s)
                rings.append(np.array(ring, dtype=float))
        return rings

@lru_cache(maxsize=1)
def _tile_assemble_udf():
    def _assemble(key, pdf):
        import numpy as np
        import pandas as pd

        from spatialdata_spark.geometry import predicates as P
        from spatialdata_spark.geometry import wkb as W

        label = int(key[0])
        rings = _walk_rings(
            pdf["x0"].to_numpy(), pdf["y0"].to_numpy(), pdf["x1"].to_numpy(), pdf["y1"].to_numpy()
        )
        exteriors = []  # (ring, area)
        holes = []
        for r in rings:
            a = P.ring_area(r)
            (exteriors if a > 0 else holes).append((r, abs(a)))
        # nest each hole into the smallest containing exterior
        polys: list[list[np.ndarray]] = [[r] for r, _ in exteriors]
        for hr, _ in holes:
            # probe point: center of the first edge, offset a half unit
            # to the interior-left (a pixel center of the label region)
            p0, p1 = hr[0], hr[1]
            mid = (p0 + p1) / 2.0
            d = p1 - p0
            probe = mid + np.array([-d[1], d[0]]) * 0.5
            best = None
            best_area = None
            for i, (er, ea) in enumerate(exteriors):
                if P.points_in_ring(np.array([probe[0]]), np.array([probe[1]]), er)[0]:
                    if best is None or ea < best_area:
                        best, best_area = i, ea
            if best is not None:
                polys[best].append(hr)
        if not polys:
            return pd.DataFrame(columns=[f.name for f in _SHAPES_SCHEMA.fields])
        if len(polys) == 1:
            buf = W.encode_polygon(polys[0])
            kind = "polygon"
        else:
            buf = W.encode_multipolygon(polys)
            kind = "multipolygon"
        allv = np.vstack([r for poly in polys for r in poly])
        return pd.DataFrame(
            [
                (
                    label,
                    kind,
                    buf,
                    float(allv[:, 0].min()),
                    float(allv[:, 1].min()),
                    float(allv[:, 0].max()),
                    float(allv[:, 1].max()),
                    None,
                )
            ],
            columns=[f.name for f in _SHAPES_SCHEMA.fields],
        )

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.util import PythonEvalType

    return pandas_udf(_assemble, returnType=_SHAPES_SCHEMA, functionType=PythonEvalType.SQL_GROUPED_MAP_PANDAS_UDF)


def labels_to_polygons(labels_long: DataFrame) -> DataFrame:
    """Labels -> per-label bounding polygon via marching-squares-lite.

    The reference extracts exact contours per chunk then dissolves
    across chunks (vectorize.py:159-302).  Scale plan mirrored here:
    per-partition contour extraction (applyInPandas per label over the
    label's pixels), one groupBy(label).  Round-1 implementation emits
    the label's pixel-union outline as a rectilinear hull; exact
    marching squares lands with the raster tile layer.
    """
    from spatialdata_spark.operators.raster import _apply_in_pandas_cached

    return _apply_in_pandas_cached(
        labels_long.filter(F.col("label") != 0).groupBy("label"), _outline_udf()
    )


@lru_cache(maxsize=1)
def _outline_udf():
    def _outline(pdf):
        import numpy as np
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        label = int(pdf["label"].iloc[0])
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        minx, maxx = float(xs.min()), float(xs.max() + 1)
        miny, maxy = float(ys.min()), float(ys.max() + 1)
        # rectilinear hull: per-pixel-row x-extent, stair-stepped so each
        # row contributes its full unit height (exact for row-convex
        # regions, conservative otherwise)
        rows = []
        for y in np.unique(ys):
            m = ys == y
            rows.append((float(y), float(xs[m].min()), float(xs[m].max() + 1)))
        left = []
        right = []
        for y, x0, x1 in rows:  # ascending y up the left side
            left += [(x0, y), (x0, y + 1)]
        for y, x0, x1 in reversed(rows):  # descending y down the right side
            right += [(x1, y + 1), (x1, y)]
        ring = np.array(left + right)
        return pd.DataFrame(
            [
                (
                    label,
                    "polygon",
                    W.encode_polygon([ring]),
                    minx,
                    miny,
                    maxx,
                    maxy,
                    None,
                )
            ],
            columns=["shape_id", "kind", "wkb", "minx", "miny", "maxx", "maxy", "radius"],
        )

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.util import PythonEvalType

    return pandas_udf(_outline, returnType=_SHAPES_SCHEMA, functionType=PythonEvalType.SQL_GROUPED_MAP_PANDAS_UDF)
