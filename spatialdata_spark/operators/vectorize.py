"""Raster/vector conversion: to_circles, to_polygons.

Reference: src/spatialdata/_core/operations/vectorize.py —
to_circles :38-156 (equal-area circles from labels/polygons),
to_polygons :159-302 (per-chunk contours + cross-chunk dissolve).
"""

from __future__ import annotations

import math

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


def shapes_to_circles(shapes: DataFrame) -> DataFrame:
    """Polygons -> equal-area circles at their centroid; circles pass
    through (reference: vectorize.py:38-120)."""
    from spatialdata_spark.operators.measures import centroids_shapes

    schema = T.DoubleType()

    @F.pandas_udf(schema)
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


def circles_to_polygon_shapes(circles: DataFrame, n_vertices: int = 32) -> DataFrame:
    """Circles -> n-gon polygon shapes (`buffer()` analog,
    reference: vectorize.py:270-302)."""
    schema = T.BinaryType()

    @F.pandas_udf(schema)
    def _ngon(x_s, y_s, r_s):
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        return pd.Series(
            [
                W.encode_polygon([W.regular_polygon(float(x), float(y), float(r), n_vertices)])
                for x, y, r in zip(x_s, y_s, r_s)
            ]
        )

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


def circles_to_shapes(circles: DataFrame) -> DataFrame:
    """(shape_id, x, y, radius) -> canonical shapes schema rows of kind
    'point' with bbox padded by radius."""
    @F.pandas_udf(T.BinaryType())
    def _pt(x_s, y_s):
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        return pd.Series([W.encode_point(float(x), float(y)) for x, y in zip(x_s, y_s)])

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

    @F.pandas_udf(T.BinaryType())
    def _rect(minx_s, miny_s, maxx_s, maxy_s):
        import numpy as np
        import pandas as pd

        from spatialdata_spark.geometry import wkb as W

        return pd.Series(
            [
                W.encode_polygon([np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)])
                for x0, y0, x1, y1 in zip(minx_s, miny_s, maxx_s, maxy_s)
            ]
        )

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


def labels_to_polygons(labels_long: DataFrame) -> DataFrame:
    """Labels -> per-label bounding polygon via marching-squares-lite.

    The reference extracts exact contours per chunk then dissolves
    across chunks (vectorize.py:159-302).  Scale plan mirrored here:
    per-partition contour extraction (applyInPandas per label over the
    label's pixels), one groupBy(label).  Round-1 implementation emits
    the label's pixel-union outline as a rectilinear hull; exact
    marching squares lands with the raster tile layer.
    """
    schema = T.StructType(
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

    return (
        labels_long.filter(F.col("label") != 0)
        .groupBy("label")
        .applyInPandas(_outline, schema)
    )
