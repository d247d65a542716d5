"""Distributed BPE tokenizer training and encoding.

The classic Sennrich/Gage byte-pair-encoding loop re-expressed in the
shape a 100 TB corpus needs:

* Pair statistics are computed over the **distinct-word frequency
  table**, not the corpus (the standard BPE-training optimization —
  the word table is vocabulary-sized and shrinks by Zipf no matter how
  large the corpus is), with a map-side-combining SUM on symbol-pair
  keys.
* Each round's winning merge is one collected row (model state), and
  applying it is a **broadcast map** — a single string ``replace`` per
  word, no shuffle.  ``n_merges`` rounds means ``n_merges``
  vocabulary-sized aggregations; the corpus itself is only touched
  once (to build the word table) plus once more at encode time.

Merge-application semantics are the HuggingFace-trainer ones: scan the
symbol sequence left to right, merge on match, continue after the
merged pair (non-overlapping).  That is EXACTLY what SQL's standard
``replace(s, find, rep)`` does, so the whole loop replays in ANSI SQL.

The symbol-sequence encoding is the part that makes ``replace`` safe:
symbols are separated by TWO spaces with single-space guards at both
ends (`` a  b  c ``).  A merge rewrites ``' a  b '`` → ``' ab '``:
the pattern's leading space + double interior gap can only match a
complete symbol pair (a symbol with extra characters breaks the
double-space run), and the replacement consumes one guard space while
leaving the other, so the neighbours' separators survive — runs merge
exactly like the left-to-right scan (`` a  a  a `` → `` aa  a ``).

Ties on pair count break by ``(left ASC, right ASC)`` binary
collation — deterministic in both engines.

Reference: the reference engine has no tokenizer surface; this covers
the training-data-pipeline extension (the tokenizer-training batch job
that precedes token counting in ``textstats.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bpe_word_table", "bpe_train", "bpe_token_counts"]


def bpe_word_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct-word frequency table with the initial character-level
    symbol sequence (double-space separated, single-space guards)."""
    words = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    seq = F.concat(
        F.lit(" "),
        F.rtrim(F.regexp_replace(F.col("w"), "(.)", "$1  ")),
        F.lit(" "),
    )
    return wf.select("w", "freq", seq.alias("seq"))


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency —
    a vocabulary-sized map-side-combining aggregation."""
    syms = F.split(F.trim(F.col("seq")), "  ")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.struct(
                F.element_at(syms, (i + 1).cast("int")).alias("l"),
                F.element_at(syms, (i + 2).cast("int")).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        wf.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 4, text_col: str = "text"
):
    """Learn ``n_merges`` BPE merges.  Returns ``(merges_df, wf)``:
    ``merges_df`` has ``(rank, left, right, merged, cnt)`` — the model,
    always ``n_merges`` rows regardless of corpus size; ``wf`` is the
    word table with the fully merged symbol sequences (the encode-time
    input).  Each round collects ONE row (the argmax pair) and applies
    it map-side via ``replace`` — no shuffle touches the corpus."""
    spark = docs.sparkSession
    wf = bpe_word_table(docs, text_col).persist()
    merges = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, l, r, l + r, cnt))
        wf = wf.withColumn(
            "seq",
            F.expr(
                "replace(seq, ' ' || {l} || '  ' || {r} || ' ', "
                "' ' || {l} || {r} || ' ')".format(
                    l=_sql_str(l), r=_sql_str(r)
                )
            ),
        )
        # re-literalize the (vocabulary-sized) word table every round so
        # lineage stays flat; at corpus scale this is a checkpoint, at
        # test scale a persist is enough
        wf = wf.persist()
    merges_df = spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, cnt BIGINT"
    )
    return merges_df, wf


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_token_counts(
    docs: DataFrame,
    wf_merged: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode-time token counting: per-document BPE token totals under
    the trained merges.  The per-doc word multiset joins the merged
    word table (vocabulary-sized → broadcast-gated); tokens per word =
    symbol count of the merged sequence."""
    spark = docs.sparkSession
    doc_words = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            id_col,
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(F.length("w") > 0)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lut = wf_merged.select(
        "w", F.size(F.split(F.trim(F.col("seq")), "  ")).alias("n_syms")
    )
    if spark.sparkContext.master.startswith("local"):
        lut = F.broadcast(lut)
    return (
        doc_words.join(lut, "w")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("n_syms")).alias("n_bpe_tokens"))
    )
