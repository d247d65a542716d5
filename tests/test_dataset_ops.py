"""Container-level queries over the blobs demo scene; the oracle is
direct numpy computation on the generating arrays."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialdata_spark.datasets import blobs
from spatialdata_spark.operators.container import (
    get_extent_dataset,
    transform_to_data_extent,
)
from spatialdata_spark.transformations import Identity


@pytest.fixture(scope="module")
def scene(spark):
    return blobs(spark, length=128, n_cells=12, n_points=500)


def test_blobs_shape(scene):
    ds, meta = scene
    assert sorted(ds.element_names()) == [
        "blobs_circles",
        "blobs_image",
        "blobs_labels",
        "blobs_points",
        "blobs_table",
    ]
    assert ds["blobs_points"].count() == 500
    assert ds["blobs_circles"].count() == 12


def test_bbox_query_dataset(scene):
    ds, meta = scene
    out = ds.query.bounding_box(("x", "y"), [30.0, 30.0], [90.0, 90.0])
    # points: exclusive bounds oracle
    pts = ds["blobs_points"].toPandas()
    want = ((pts.x > 30) & (pts.x < 90) & (pts.y > 30) & (pts.y < 90)).sum()
    assert out["blobs_points"].count() == want
    # labels: inclusive integer slice oracle
    lab = ds["blobs_labels"].toPandas()
    want_lab = ((lab.x >= 30) & (lab.x <= 90) & (lab.y >= 30) & (lab.y <= 90)).sum()
    assert out["blobs_labels"].count() == want_lab
    # table follows surviving circles
    kept_ids = {r["shape_id"] for r in out["blobs_circles"].collect()}
    trows = out["blobs_table"].collect()
    assert {r["instance_id"] for r in trows} == kept_ids


def test_polygon_query_dataset(scene):
    ds, meta = scene
    tri = np.array([[10.0, 10.0], [120.0, 20.0], [60.0, 120.0]])
    out = ds.query.polygon(tri)
    # triangle area test on points via half-planes
    pts = ds["blobs_points"].toPandas()

    def inside(x, y):
        n = len(tri)
        area = sum(
            tri[i][0] * tri[(i + 1) % n][1] - tri[(i + 1) % n][0] * tri[i][1] for i in range(n)
        )
        ring = tri if area > 0 else tri[::-1]
        ok = np.ones(len(x), dtype=bool)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            ok &= ((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) > 0
        return ok

    want = inside(pts.x.to_numpy(), pts.y.to_numpy()).sum()
    got = out["blobs_points"].count()
    # polygon_query_points uses bbox prefilter + exact pip (ray casting):
    # strict-interior agreement can differ only on boundary-exact points
    assert got == want


def test_extent_and_normalize(scene):
    ds, meta = scene
    ext = get_extent_dataset(ds)
    pts = ds["blobs_points"].toPandas()
    circ = ds["blobs_circles"].toPandas()
    lab = ds["blobs_labels"].toPandas()
    assert ext["x"][0] == min(pts.x.min(), circ.minx.min(), lab.x.min())
    assert ext["x"][1] >= max(pts.x.max(), circ.maxx.max())
    norm = transform_to_data_extent(ds, target_width=100.0)
    ext2 = get_extent_dataset(norm)
    assert ext2["x"][0] >= -1e-9 and ext2["x"][1] <= 100.0 + 1e-9
    assert ext2["y"][0] >= -1e-9 and ext2["y"][1] <= 100.0 + 1e-9


def test_spatially_partitioned_store_prunes(spark, tmp_path):
    """Partitioned write + bbox read: results match the plain filter AND
    the scan only touches the partitions the box intersects."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from spatialdata_spark.catalog import SpatialDataset

    pts = spark.range(2000).select(
        (F.col("id") % 100 * 1.0).alias("x"),
        (F.col("id") % 37 * 1.0).alias("y"),
        F.col("id").alias("instance_id"),
    )
    ds = SpatialDataset(spark)
    ds.add_points("pts", pts)
    store = str(tmp_path / "store")
    ds.write_element_spatially_partitioned(store, "pts", cell_size=16.0)

    got = SpatialDataset.read_element_bbox(
        spark, store, "points", "pts", 16.0, [10.0, 5.0], [30.0, 20.0]
    )
    want = pts.filter(
        (F.col("x") > 10.0) & (F.col("x") < 30.0) & (F.col("y") > 5.0) & (F.col("y") < 20.0)
    )
    assert sorted(r["instance_id"] for r in got.collect()) == sorted(
        r["instance_id"] for r in want.collect()
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    # x spans cells 0..6, box [10,30] touches cells 0 and 1 only
    assert "PartitionFilters" in plan
    assert "__cell_x" in plan


def test_polygon_query_shapes_concave_clip(spark):
    """clip=True with an L-shaped (concave) query ring: clipped areas
    must equal the rectangle-decomposition ground truth."""
    import numpy as np
    from pyspark.sql import functions as F

    from spatialdata_spark.operators.spatial_query import polygon_query_shapes
    from spatialdata_spark.operators.vectorize import boxes_to_shapes

    boxes = spark.createDataFrame(
        [
            (1, 1.0, 1.0, 3.0, 3.0),     # straddles the notch corner
            (2, 4.5, 0.5, 7.5, 1.5),     # inside the bottom arm
            (3, 0.5, 4.5, 1.5, 7.5),     # inside the left arm
            (4, 5.0, 5.0, 9.0, 9.0),     # inside the notch: no overlap
            (5, -2.0, -2.0, 10.0, 10.0), # covers the whole L
        ],
        ["shape_id", "minx", "miny", "maxx", "maxy"],
    )
    # L = [0,8]x[0,8] minus [4,8]x[4,8] -> area 48
    L = np.array([[0, 0], [8, 0], [8, 4], [4, 4], [4, 8], [0, 8]], dtype=float)

    def l_area(x0, y0, x1, y1):
        def rect(a0, b0, a1, b1):
            return max(0.0, min(x1, a1) - max(x0, a0)) * max(0.0, min(y1, b1) - max(y0, b0))

        return rect(0, 0, 8, 4) + rect(0, 4, 4, 8)

    out = polygon_query_shapes(boxes_to_shapes(boxes), L, clip=True)
    got = {r["shape_id"]: r["clip_area"] for r in out.collect()}
    assert 4 not in got
    for sid, (x0, y0, x1, y1) in {1: (1, 1, 3, 3), 2: (4.5, 0.5, 7.5, 1.5), 3: (0.5, 4.5, 1.5, 7.5), 5: (-2, -2, 10, 10)}.items():
        assert abs(got[sid] - l_area(x0, y0, x1, y1)) < 1e-9, sid
    assert abs(got[5] - 48.0) < 1e-9


def test_read_jsonl_quarantines_malformed(spark, tmp_path):
    import gzip
    import json as js
    import os

    from spatialdata_spark.sources.corpus import read_jsonl, write_jsonl

    src = str(tmp_path / "corpus")
    os.makedirs(src)
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "a", "n_chars": 11},
        {"doc_id": 2, "text": "bon jour", "lang": "fr", "source": "b", "n_chars": 8},
        {"doc_id": 3, "text": "third", "lang": "en", "source": "a", "n_chars": 5},
    ]
    lines = [js.dumps(good[0]), "{not valid json", js.dumps(good[1]), '"just a string"']
    with open(f"{src}/part0.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    # a gzip shard read transparently by the same scan
    with gzip.open(f"{src}/part1.jsonl.gz", "wt") as f:
        f.write(js.dumps(good[2]) + "\n")

    docs, bad = read_jsonl(spark, src)
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2, 3}
    assert got[3]["text"] == "third"  # from the gzip shard
    badlines = sorted(r["raw_line"] for r in bad.collect())
    assert badlines == sorted(["{not valid json", '"just a string"'])

    # stable content-hash ids: same text -> same id across runs
    d2, _ = read_jsonl(spark, src, assign_ids=True)
    a = {r["text"]: r["doc_id"] for r in d2.collect()}
    d3, _ = read_jsonl(spark, src, assign_ids=True)
    assert a == {r["text"]: r["doc_id"] for r in d3.collect()}

    # round-trip through partitioned gzip shards
    out = str(tmp_path / "out")
    write_jsonl(docs, out, partition_by=["lang"])
    back, bad2 = read_jsonl(spark, out + "/lang=en")
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 3]
    assert bad2.count() == 0


def test_jsonl_end_to_end_curation_pipeline(spark, tmp_path):
    """The full user story in one test: JSONL shards in (with dirty
    lines), quality gate + dedup survivors out, leakage-safe split,
    partitioned JSONL shards back to disk — every stage a declarative
    plan over the same session."""
    import json as js
    import os
    import random

    from pyspark.sql import functions as F

    from spatialdata_spark.pipeline.filters import hash_split
    from spatialdata_spark.pipeline.textstats import gopher_rules
    from spatialdata_spark.sources.corpus import read_jsonl, write_jsonl

    rng = random.Random(61)
    words = ["the", "quick", "analysis", "of", "results", "shows", "clear", "methods"]
    src = str(tmp_path / "raw")
    os.makedirs(src)
    with open(f"{src}/shard0.jsonl", "w") as f:
        for i in range(40):
            text = " ".join(rng.choice(words) for _ in range(60))
            if i % 2:
                text = text.upper()  # same tokens, case-insensitive dupes stay distinct docs
            f.write(js.dumps({"doc_id": i, "text": text, "lang": "en",
                              "source": "web", "n_chars": len(text)}) + "\n")
        f.write("{broken\n")  # quarantine line

    docs, bad = read_jsonl(spark, src)
    assert bad.count() == 1 and docs.count() == 40

    gated = gopher_rules(docs).filter(F.col("passes") == 1).select("doc_id")
    kept = docs.join(gated, "doc_id")
    assert 0 < kept.count() <= 40

    split = hash_split(kept)
    out = str(tmp_path / "curated")
    write_jsonl(split, out, partition_by=["split"])
    back, bad2 = read_jsonl(spark, out + "/split=train")
    assert bad2.count() == 0
    # round-trip preserves every curated train row exactly
    train_ids = {r["doc_id"] for r in split.filter(F.col("split") == "train").collect()}
    assert {r["doc_id"] for r in back.collect()} == train_ids


def test_read_csv_corpus_quarantine_and_headers(spark, tmp_path):
    import os

    from spatialdata_spark.sources.corpus import read_csv_corpus

    src = str(tmp_path / "csv")
    os.makedirs(src)
    hdr = "doc_id,text,lang,source,n_chars"
    with open(f"{src}/a.csv", "w") as f:
        f.write(hdr + "\n")
        f.write('1,hello,en,web,5\n')
        f.write('not,a,valid,,row,with,extra\n')   # too many cols -> nulls? permissive keeps matching prefix
        f.write('2,"quoted, text",fr,web,12\n')
    with open(f"{src}/b.csv", "w") as f:          # second shard repeats header
        f.write(hdr + "\n")
        f.write('3,third,en,books,5\n')
        f.write('"unterminated quote,en\n')

    docs, bad = read_csv_corpus(spark, src)
    got = {r["doc_id"]: r for r in docs.collect()}
    assert {1, 2, 3} <= set(got)
    assert got[2]["text"] == "quoted, text"
    assert got[3]["source"] == "books"
    # header lines are not rows and not rejects; garbage lines are one of the two
    assert bad.count() >= 1
    assert docs.count() + bad.count() == 5  # 4 data-ish lines + 1 weird counted once
