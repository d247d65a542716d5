"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting.  All hot-path expressions are JVM-side builtins
(regexp/length/split); only language-ID needs a (vectorized) UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword lists for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
}


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features — pure Catalyst expressions:
    char count, token count, punctuation ratio, digit ratio, uppercase
    ratio, mean word length, stopword ratio (en)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    # whitespace tokenization; empty string -> 0 tokens
    tokens = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(tokens))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    sw = _STOPWORDS["en"]
    lower_padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    n_stop = None
    for w in sw:
        c = (F.length(lower_padded) - F.length(F.regexp_replace(lower_padded, rf"\b{w}\b", ""))) / len(w)
        n_stop = c if n_stop is None else n_stop + c
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        ((n_chars - n_space) / F.greatest(n_tokens, F.lit(1))).alias("mean_word_len"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 9).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: rewards stopword presence and
    sane word lengths, penalizes punctuation/digit soup.  Heuristic in
    the spirit of C4/Gopher text-quality rules."""
    s = text_stats(docs, text_col, id_col)
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), F.col("punct_ratio") * 4)
        * F.lit(0.25)
        - F.least(F.lit(1.0), F.col("digit_ratio") * 5) * F.lit(0.25)
        + F.least(F.lit(0.25), F.col("stopword_ratio"))
        - F.when((F.col("mean_word_len") < 3) | (F.col("mean_word_len") > 12), 0.25).otherwise(0.0)
    )
    return s.select(id_col, F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)).alias("quality"))


def token_count_bpe_ish(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token count with a BPE-ish regex (GPT-2 style word/number/punct
    splitting) — a JVM regexp, no UDF."""
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    return docs.select(F.col(id_col), F.size(toks).alias("n_bpe_tokens"))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es} (+'unknown') — pure
    Catalyst expressions, no Python UDF.

    A language scores one point per stopword present as a
    whitespace-delimited token (padded-substring test on the
    whitespace-normalized lowercase text).  The winner needs >=2 hits;
    ties resolve to the earlier language in {en,de,fr,es} order.
    """
    lp = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "),
        F.lit(" "),
    )
    langs = list(_STOPWORDS)
    hit_cols = {}
    for lang in langs:
        h = None
        for w in _STOPWORDS[lang]:
            c = F.when(F.instr(lp, f" {w} ") > 0, 1).otherwise(0)
            h = c if h is None else h + c
        hit_cols[lang] = h
    scored = docs.select(
        F.col(id_col), *[hit_cols[lang].alias(f"__h_{lang}") for lang in langs]
    )
    pred = None
    for i, lang in enumerate(langs):
        me = F.col(f"__h_{lang}")
        cond = me >= 2
        for j, other in enumerate(langs):
            if j < i:
                cond = cond & (me > F.col(f"__h_{other}"))  # earlier lang wins ties
            elif j > i:
                cond = cond & (me >= F.col(f"__h_{other}"))
        branch = F.when(cond, lang)
        pred = branch if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("unknown")
    return scored.select(F.col(id_col), pred.alias("lang_pred"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 64-bit rolling-hash fingerprint (content-defined):
    xxhash64 of the normalized text + first/last 64 chars — expressions
    only."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.xxhash64(norm).alias("fingerprint"),
        F.xxhash64(F.substring(norm, 1, 64)).alias("prefix_fp"),
        F.xxhash64(F.substring(F.reverse(norm), 1, 64)).alias("suffix_fp"),
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by total frequency with document
    frequency — the canonical (token)-keyed aggregate with map-side
    combine; top-k is a ``TakeOrdered``, never a full sort shuffle.
    Ties order lexicographically for determinism."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("token"))
    return (
        exploded.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set (Robertson & Walker's published ranking function) — the
    seed-based curation primitive: score a 100 TB crawl against a
    handful of quality-seed terms and keep the tail above a threshold.

    Plan: one token explode filtered to the query terms (the filter
    collapses the exploded volume to |terms|-matched rows BEFORE any
    shuffle), one (doc, term) count with map-side combine, document
    frequencies as a |terms|-row broadcast, and the corpus constants
    (N, avgdl) as a 1-row cross join.  No UDFs, no full-vocabulary
    aggregate — work is bounded by query-term hits, not corpus tokens.

    Output: ``(doc_id, score)`` for documents matching >=1 term.
    """
    from spatialdata_spark.pipeline.filters import word_tokens

    terms = sorted(set(query_terms))
    toks = word_tokens(text_col)
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, 0)
        .otherwise(F.size(toks))
        .alias("__len"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__len").alias("__avgdl")
    )
    hits = base.select(
        id_col, "__len", F.explode("__toks").alias("__t")
    ).filter(F.col("__t").isin(terms))
    tf = hits.groupBy(id_col, "__len", "__t").agg(F.count(F.lit(1)).alias("__tf"))
    df = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(df), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log((F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1.0))
            / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__len") / F.col("__avgdl"))),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("__s").alias("score"))
