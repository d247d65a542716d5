"""Positional document fingerprinting: winnowing (MOSS) and
content-defined chunking statistics.

Reference parity: the reference engine has no fingerprinting operators;
these extend the corpus-dedup family (``pipeline/dedup.py``) with the
two classic *positional* schemes a 100 TB training-data pipeline uses —
winnowing fingerprints for plagiarism/overlap detection (Schleimer,
Wilkerson & Aiken, SIGMOD 2003) and content-defined chunk boundaries
for storage-level dedup (Muthitacharoen et al., LBFS, SOSP 2001).

Both are built on the repo's engine-common 31-bit polynomial gram hash
(Horner over code points mod P=2^31-1 — every intermediate < 2^52, so
the arithmetic is exact int64 and replays bit-for-bit in ANSI SQL /
DuckDB, which is what makes exact oracles possible; see
``dedup.py`` `_H31`).  All heavy work is JVM-side Catalyst expressions
— no Python in the hot path.

Scale notes (100 TB): the gram explode is map-side (no shuffle); the
winnowing window-min groups on ``(doc, window)`` — hash-partitioned,
map-side combinable, never wider than w rows per group.  Chunk stats
aggregate per document with partial aggregation.  Neither operator
shuffles document text — only (id, pos, hash) triples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: polynomial base / modulus shared with the dedup shingle hashes
_B, _P = 1000003, 2147483647


def gram_hash(gram: Column, k: int) -> Column:
    """31-bit polynomial hash of a fixed-width ``k``-char gram:
    ``h = ((...(c1*B + c2) % P)*B + c3) % P ...`` — Horner with a mod
    per step keeps every intermediate below ``P*B + 127 < 2^52``."""
    h = F.lit(0).cast("long")
    for j in range(1, k + 1):
        h = (h * _B + F.ascii(F.substring(gram, j, 1))) % _P
    return h


def gram_hash_sql(gram_expr: str, k: int) -> str:
    """The ANSI-SQL twin of :func:`gram_hash` (for DuckDB oracles)."""
    h = "CAST(0 AS BIGINT)"
    for j in range(1, k + 1):
        h = f"(({h}) * {_B} + ascii(substr({gram_expr}, {j}, 1))) % {_P}"
    return h


def _grams(docs: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """Explode each document into ``(id, pos, gram-hash)`` for every
    k-char gram starting at 1-based ``pos`` — map-side only."""
    ng = F.greatest(F.lit(0), F.length(F.col(text_col)) - (k - 1))
    gram = F.col(text_col).substr(F.col("pos"), F.lit(k))
    return (
        docs.select(F.col(id_col), F.col(text_col), ng.alias("__ng"))
        .filter(F.col("__ng") > 0)
        .select(
            id_col,
            text_col,
            "__ng",
            F.explode(F.sequence(F.lit(1), F.col("__ng"))).alias("pos"),
        )
        .select(
            id_col,
            "__ng",
            "pos",
            gram_hash(gram, k).alias("h"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, §4):
    hash every k-gram, slide a window of ``w`` consecutive gram hashes,
    and in each window select the minimum hash — rightmost occurrence
    on ties.  The selected ``(pos, hash)`` pairs (deduplicated) are the
    document's fingerprint set; the guarantee is that any shared
    substring of length ``>= w + k - 1`` contributes at least one
    common fingerprint.

    Spark formulation: ONE window pass — for every window start
    ``j <= nw`` (``nw = max(1, ng-w+1)``; documents with fewer than
    ``w`` grams form a single window) take
    ``min(struct(h, -pos))`` over the frame ``[j, j+w-1]``: struct
    ordering gives the min hash first, then the largest position among
    ties.  No join, no row multiplication — the only exchange is the
    hash partition for the per-document sort, and the frame min is a
    single forward scan per partition (Spark's sliding-frame
    aggregate).  At 100 TB this beats the relational
    explode-to-w-windows + (doc, window) groupBy formulation (which
    multiplies the gram stream by ``w`` and joins an aggregate back to
    it); the relational form survives as the ANSI-SQL oracle
    (``PL_WINNOW_SQL``) and is equality-pinned against this plan by
    the driver gate and the randomized pure-Python reference test.

    Returns ``(id, pos, fp)`` — one row per distinct selected
    fingerprint.  Documents shorter than ``k`` chars have no grams and
    no fingerprints.
    """
    from pyspark.sql.window import Window

    grams = _grams(docs, k, id_col, text_col)
    nw = F.greatest(F.lit(1), F.col("__ng") - (w - 1))
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        grams.withColumn(
            "__m",
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win),
        )
        .filter(F.col("pos") <= nw)
        .select(
            id_col,
            (-F.col("__m.np")).cast("int").alias("pos"),
            F.col("__m.h").alias("fp"),
        )
    )
    return sel.distinct()


def cdc_chunk_stats(
    docs: DataFrame,
    k: int = 4,
    mask_mod: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking statistics (LBFS-style): a chunk
    boundary falls after every position whose trailing ``k``-gram hash
    satisfies ``h % mask_mod == 0`` — boundaries move with content,
    so an insertion early in a document does not re-chunk its tail
    (the property storage-level dedup needs).  This variant is the
    pure mod-rule (no min/max chunk clamps — those are sequential and
    belong to the storage layer), so every position is independent and
    the whole computation is one map-side explode + one partial
    aggregation.

    Returns per document: ``(id, n_chars, n_boundaries, n_chunks,
    avg_chunk_len)`` where ``n_chunks = n_boundaries + 1`` (a final
    partial chunk always exists) and ``avg_chunk_len`` is
    ``n_chars / n_chunks`` rounded to 6 dp.  Documents shorter than
    ``k`` chars are a single chunk.
    """
    grams = _grams(docs, k, id_col, text_col)
    nb = (
        grams.filter(F.col("h") % mask_mod == 0)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_boundaries"))
    )
    base = docs.select(
        F.col(id_col), F.length(F.col(text_col)).cast("long").alias("n_chars")
    )
    out = base.join(nb, id_col, "left").fillna({"n_boundaries": 0})
    n_chunks = (F.col("n_boundaries") + 1).cast("long")
    return out.select(
        id_col,
        "n_chars",
        "n_boundaries",
        n_chunks.alias("n_chunks"),
        F.round(F.col("n_chars") / n_chunks, 6).alias("avg_chunk_len"),
    )
