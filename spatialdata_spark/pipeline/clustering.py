"""Embedding clustering: fixed-point Lloyd's k-means, SemDeDup-style
semantic near-dup removal, and exact brute-force k-NN classification.

The 100 TB shapes these are built for:

* **k-means** — the model state (k x dim centroids) is always
  driver-metadata-sized no matter how large the corpus is, so each
  Lloyd iteration is one *unconditionally* broadcast join (k*dim
  literals, not a data-sized side) followed by a map-side-combining
  aggregation whose key space is ``k * dim`` — the reduce stage shrinks
  with the model, never with the data.  Iterations re-literalize the
  centroid table through the driver (the same metadata-sized
  ``collect`` contract as the IVF sampler in ``similarity.py``), so
  the lineage stays one-join-deep regardless of ``n_iter``.
* **semantic dedup** — the SemDeDup recipe (Abbas et al. 2023):
  cluster first, then compare pairs only *within* a cluster, so the
  candidate join is an equi-join on the cluster id and per-block work
  is (n/k)^2 instead of n^2.  A skewed giant cluster is the known
  failure mode at corpus scale; the mitigation (re-split oversized
  clusters by a secondary hash before the pair join) composes with
  this operator unchanged.
* **k-NN** — exact brute force by stated contract (the parity
  baseline for the ANN family in ``similarity.py``); the pair space
  is the documented n_test x n_train quadratic.

Everything is computed in **fixed-point integer arithmetic**
(components quantized to ``floor(x * 100 + 0.5)``; centroids carry an
extra x1024 sub-integer resolution): integer sums are exact in any
accumulation order, so Spark's partial-aggregate ordering and the
oracle's single-threaded ordering cannot diverge by even one ulp —
assignments, thresholds and inertia values replay bit-exactly in
ANSI SQL.  The cosine threshold compares ``scale * dot^2`` against
``round(threshold^2 * scale) * |a|^2 * |b|^2`` (both BIGINT), which
is exactly ``cos >= threshold`` for positive dots at the stated
quantization — no division, no floats.

Reference parity: the reference has no clustering operators (its
scope stops at spatial aggregation); these cover the
training-data-pipeline surface (semantic dedup over an embedding
column) that a 100 TB corpus build needs alongside the MinHash/LSH
family in ``dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "quantize_long",
    "kmeans_lloyd",
    "semantic_dedup_kmeans",
    "knn_classify",
]

#: sub-integer resolution carried by centroid coordinates.  Points are
#: compared against centroids in the common x(Q*CSCALE) grid.
CSCALE = 1024


def quantize_long(
    embeddings: DataFrame,
    q: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Long-format fixed-point view: one row per (id, pos) with
    ``val = floor(x * q + 0.5)`` as BIGINT.  ``floor`` on the shared
    IEEE double product is deterministic across engines (unlike
    ``round``, whose half-way rule differs)."""
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    ).select(
        "id",
        "pos",
        F.floor(F.col("x") * q + F.lit(0.5)).cast("long").alias("val"),
    )


def _assign(points_long: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd assignment: argmin_j sum_d (CSCALE*val - cval)^2 with
    ties to the smallest cluster id.  The centroid side is k*dim rows —
    model state, broadcast unconditionally (this is NOT a data-sized
    side; see module docstring)."""
    d = (
        points_long.join(F.broadcast(centroids), "pos")
        .groupBy("id", "j")
        .agg(
            F.sum(
                (F.col("val") * CSCALE - F.col("cval"))
                * (F.col("val") * CSCALE - F.col("cval"))
            ).alias("dist")
        )
    )
    return d.groupBy("id").agg(
        F.min(F.struct("dist", "j")).alias("m")
    ).select("id", F.col("m.j").alias("cluster"), F.col("m.dist").alias("dist"))


def _update(
    points_long: DataFrame, assign: DataFrame, prev: DataFrame
) -> DataFrame:
    """New centroids: per-(cluster, pos) integer mean re-quantized to
    the CSCALE grid — ``floor(CSCALE * S / n + 0.5)`` on the exact
    BIGINT sum.  Clusters that lost every member keep their previous
    coordinates (COALESCE against ``prev``), so k never shrinks."""
    upd = (
        points_long.join(assign.select("id", "cluster"), "id")
        .groupBy(F.col("cluster").alias("j"), "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "j",
            "pos",
            F.floor(F.lit(float(CSCALE)) * F.col("s") / F.col("n") + F.lit(0.5))
            .cast("long")
            .alias("cval_new"),
        )
    )
    return (
        prev.join(upd, ["j", "pos"], "left")
        .select("j", "pos", F.coalesce("cval_new", "cval").alias("cval"))
    )


def _literalize(spark: SparkSession, centroids: DataFrame) -> DataFrame:
    """Collect the k*dim model state through the driver and re-emit it
    as a literal frame: keeps every iteration's plan one join deep
    (metadata-sized collect — the same contract as the IVF sampler)."""
    rows = [(int(r["j"]), int(r["pos"]), int(r["cval"])) for r in centroids.collect()]
    return spark.createDataFrame(rows, "j INT, pos INT, cval LONG")


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    q: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fixed-point Lloyd's k-means.  Deterministic init: the k rows
    with the smallest ids are the seed centroids (data-derived, same
    contract as the ANN codebooks).  Runs ``n_iter`` (assign, update)
    rounds, then one final assignment against the trained centroids.

    Returns ``(assignments, centroids)``: assignments has
    ``(id, cluster, dist)`` (dist = exact squared distance in the
    quantized grid, BIGINT); centroids has ``(j, pos, cval)``.
    """
    spark = embeddings.sparkSession
    pts = quantize_long(embeddings, q, id_col, vec_col)
    # pts is read n_iter+1 times: cache once (scan-sized, spills to disk)
    pts = pts.persist()
    seed_ids = [
        r["id"]
        for r in pts.select("id").distinct().orderBy("id").limit(k).collect()
    ]
    # map seed ids -> dense 0..k-1 via a literal lookup (k rows)
    lookup = spark.createDataFrame(
        [(int(v), int(j)) for j, v in enumerate(seed_ids)], "id LONG, j INT"
    )
    init = (
        pts.join(F.broadcast(lookup), "id")
        .select("j", "pos", (F.col("val") * CSCALE).alias("cval"))
    )
    centroids = _literalize(spark, init)
    for _ in range(n_iter):
        a = _assign(pts, centroids)
        centroids = _literalize(spark, _update(pts, a, centroids))
    final = _assign(pts, centroids)
    return final, centroids


def semantic_dedup_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.92,
    q: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: cluster, then drop every vector that has a
    lower-id cluster-mate with quantized cosine >= threshold.
    The threshold test is pure BIGINT (see module docstring), so the
    survivor set replays exactly in SQL.  Returns the surviving rows
    of ``embeddings`` plus their ``cluster``."""
    spark = embeddings.sparkSession
    assign, _ = kmeans_lloyd(embeddings, k, n_iter, q, id_col, vec_col)
    pts = quantize_long(embeddings, q, id_col, vec_col)
    withc = pts.join(assign.select("id", "cluster"), "id")
    # pair dot products and squared norms — all exact BIGINT
    a = withc.select(
        "cluster", F.col("id").alias("id_a"), "pos", F.col("val").alias("va")
    )
    b = withc.select(
        "cluster", F.col("id").alias("id_b"), "pos", F.col("val").alias("vb")
    )
    if spark.sparkContext.master.startswith("local"):
        b = F.broadcast(b)
    dots = (
        a.join(b, ["cluster", "pos"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("cluster", "id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    n2 = withc.groupBy("id").agg(F.sum(F.col("val") * F.col("val")).alias("n2"))
    if spark.sparkContext.master.startswith("local"):
        n2 = F.broadcast(n2)
    scale = 10_000
    coeff = int(round(threshold * threshold * scale))
    dup = (
        dots.join(n2.select(F.col("id").alias("id_a"), F.col("n2").alias("na2")), "id_a")
        .join(n2.select(F.col("id").alias("id_b"), F.col("n2").alias("nb2")), "id_b")
        .filter(
            (F.col("dot") > 0)
            & (F.lit(scale) * F.col("dot") * F.col("dot")
               >= F.lit(coeff) * F.col("na2") * F.col("nb2"))
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    if spark.sparkContext.master.startswith("local"):
        dup = F.broadcast(dup)
    return (
        embeddings.join(dup, id_col, "left_anti")
        .join(
            assign.select(F.col("id").alias(id_col), "cluster"), id_col
        )
    )


def knn_classify(
    embeddings: DataFrame,
    k_neighbors: int = 5,
    test_mod: int = 5,
    q: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact k-NN majority-vote classification.  Deterministic split:
    ids with ``id % test_mod == 0`` are the test set, the rest train.
    Distances are exact BIGINT in the quantized grid; the k-th
    neighbor boundary is totally ordered by ``(dist, train_id)`` and
    the vote by ``(-count, label)`` — no float, no tie ambiguity.
    Brute force O(n_test * n_train) by stated contract (the parity
    baseline the ANN recall harness measures against)."""
    spark = embeddings.sparkSession
    qv = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * q + F.lit(0.5)).cast("long"),
        ).alias("qv"),
    )
    test = qv.filter(F.col("id") % test_mod == 0).select(
        F.col("id").alias("test_id"),
        F.col("label").alias("true_label"),
        F.col("qv").alias("tv"),
    )
    train = qv.filter(F.col("id") % test_mod != 0).select(
        F.col("id").alias("train_id"),
        F.col("label").alias("train_label"),
        F.col("qv").alias("rv"),
    )
    if spark.sparkContext.master.startswith("local"):
        train = F.broadcast(train)
    # shallow HOF (one zip_with + one aggregate) stays codegen-friendly;
    # integer sums are order-independent so any evaluation order is exact
    dist = F.aggregate(
        F.zip_with(F.col("tv"), F.col("rv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = test.crossJoin(train).select(
        "test_id", "true_label", "train_id", "train_label", dist.alias("dist")
    )
    from pyspark.sql.window import Window

    # window partitioned by TEST VECTOR — maximally fine-grained, no
    # reducer hotspot at any corpus size
    w = Window.partitionBy("test_id").orderBy("dist", "train_id")
    topk = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k_neighbors
    )
    votes = topk.groupBy("test_id", "true_label", "train_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        votes.groupBy("test_id", "true_label")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("train_label").alias("l"))).alias("m"))
        .select(
            "test_id",
            "true_label",
            F.col("m.l").alias("pred_label"),
            (F.col("m.l") == F.col("true_label")).cast("int").alias("correct"),
        )
    )
