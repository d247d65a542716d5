"""Classifier-based corpus curation, fully relational.

The modern curation recipe (DCLM, FineWeb-Edu) is: train a cheap text
classifier on a small labeled slice, score the whole corpus, keep the
top slice.  Everything here stays inside the engine's exactness
contract:

* **Naive Bayes training is count aggregation** — the one classical
  text classifier whose sufficient statistics are order-free integer
  sums, so a distributed train is bit-equal to a sequential one (no
  SGD order dependence).  The model is a vocabulary-sized table, the
  classic broadcast shape.
* **Scoring** is one token explode + one broadcast model join + one
  per-document sum of log-ratios (floats only in the final sum,
  reported at 6 dp — the repo's LM-score precision).
* **AUC** is computed EXACTLY by the Mann-Whitney rank identity on
  the score-count table: ties get the textbook average rank via
  ``2*avg_rank = 2*cum_before + n + 1`` (kept in integers until the
  single final division), and the only sort is over DISTINCT scores —
  the score table, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["nb_train", "nb_score", "auc_rank", "calibration_bins"]


def nb_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train a binary (0/1) multinomial Naive Bayes model: per-token
    counts under each class plus class token totals — pure integer
    aggregation (one explode, one vocabulary-sized groupBy with
    map-side combine), so the trained model is identical under any
    partitioning.

    Returns ``(model, totals)``: model = ``(token, c0, c1)`` integer
    counts; totals = one row ``(n0, n1, v)`` with class token totals
    and the add-one vocabulary size.
    """
    toks = docs.select(
        F.col(label_col).alias("__y"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__tok"),
    ).filter(F.col("__tok") != "")
    model = toks.groupBy(F.col("__tok").alias("token")).agg(
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    totals = model.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    return model, totals


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    totals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document mean log-likelihood ratio ``log P(tok|1) -
    log P(tok|0)`` under the add-one model (mean, not sum, so the
    score is length-comparable — the quality-ladder convention).
    Unseen tokens contribute the OOV ratio ``log((n0+v)/(n1+v))``
    (both classes back off to 1/(n+v)), kept by scoring through a
    LEFT join against the broadcast model.

    ``passthrough`` columns (functionally dependent on the id, e.g. a
    label) ride through the per-document aggregation as extra group
    keys — carrying them here avoids a corpus-sized join-back later.

    Output: ``(id, *passthrough, n_tokens, llr_mean)``, 6 dp.
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in passthrough],
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    m = model
    if spark.sparkContext.master.startswith("local"):
        m = F.broadcast(m)
    joined = toks.join(m, "token", "left").crossJoin(F.broadcast(totals))
    llr = F.log(
        (F.coalesce(F.col("c1"), F.lit(0)) + 1.0) / (F.col("n1") + F.col("v"))
    ) - F.log(
        (F.coalesce(F.col("c0"), F.lit(0)) + 1.0) / (F.col("n0") + F.col("v"))
    )
    return (
        joined.groupBy("__id", *passthrough)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(llr).alias("__s"),
        )
        .select(
            F.col("__id").alias(id_col),
            *passthrough,
            "n_tokens",
            F.round(F.col("__s") / F.col("n_tokens"), 6).alias("llr_mean"),
        )
    )


def auc_rank(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """EXACT ROC AUC by the Mann–Whitney rank-sum identity, with the
    textbook average-rank treatment of ties — computed entirely on the
    score-COUNT table (one groupBy per distinct score, one window over
    that table ordered by score, integer arithmetic until the single
    final division; the corpus itself is never globally sorted).

    ``AUC = (R1 - n1*(n1+1)/2) / (n0*n1)`` with ``R1`` the rank sum of
    the positives; per tie group ``2*avg_rank = 2*cum_before + n + 1``.
    The rank-sum accumulates ~2*N*rank ≈ 2*N² — past int64 once N
    approaches ~3e9 rows — so the product and its sum are carried in
    DECIMAL(38,0): exact at any corpus size, no silent wraparound.

    Output: one row ``(n_pos, n_neg, auc)``, 9 dp.
    """
    from pyspark.sql.window import Window

    g = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("__p"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn("__cum", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    # 2 * rank-sum contribution of this tie group's positives, in
    # DECIMAL(38,0): ~2*N*rank is bounded by ~2*N^2, past int64 near
    # N ~ 3e9 scored rows — decimal keeps EXACT exact at any scale
    two_r = F.col("__p").cast("decimal(38,0)") * (
        2 * F.col("__cum") + F.col("__n") + 1
    )
    agg = ranked.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum(F.col("__n") - F.col("__p")).cast("long").alias("n_neg"),
        F.sum(two_r).cast("decimal(38,0)").alias("__2r1"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        # single-class inputs have no ranking to score: NULL, not a
        # divide-by-zero (ANSI mode throws on bare division)
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("__2r1")
                    - F.col("n_pos").cast("decimal(38,0)")
                    * (F.col("n_pos") + 1)
                ).cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                9,
            ),
        ).alias("auc"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "llr_mean",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reliability table for a scored + labeled corpus: rank the rows
    by score into ``n_bins`` equal-count bins (ntile) and report each
    bin's size, positive count, positive fraction, and mean score —
    the classifier-curation companion of :func:`auc_rank` (does a
    higher quality score actually mean a higher P(label)?).

    Determinism: the ntile orders by ``(score, id)`` — the id
    tie-break pins bin assignment under score ties on any engine.
    The ntile is a global sort of the SCORED table (score + label +
    id only, never the text); at extreme corpus scale the documented
    swap is approx_percentile bin edges, the same trade recorded by
    this repo's other global-rank queries.

    Output: ``(bin, n_docs, n_pos, frac_pos, mean_score)``, 6 dp.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy("__s", id_col)
    b = scored.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("__y"),
        F.col(score_col).alias("__s"),
    ).withColumn("bin", F.ntile(int(n_bins)).over(w))
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.round(F.avg("__s"), 6).alias("mean_score"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n_docs"), 6).alias("frac_pos"),
            "mean_score",
        )
        .orderBy("bin")
    )
