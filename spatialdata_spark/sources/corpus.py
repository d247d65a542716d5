"""JSONL corpus source/sink — the de-facto interchange format for LLM
training data (one JSON document per line, usually gzip-shards).

Spark's JVM-side Jackson parser does the heavy lifting (scan-fused,
whole-stage codegen, transparent ``.gz``/``.zst`` codec handling at the
file level), so reading a 100 TB JSONL corpus is embarrassingly
parallel with zero Python in the path.  What this module adds is the
contract a curation pipeline needs on top of raw ``spark.read.json``:

* an **explicit schema** (schema inference is a full extra pass over
  the corpus — never acceptable at scale, and nondeterministic under
  dirty data);
* **malformed-line quarantine** instead of silent NULL-ing: lines are
  read as text and parsed with ``from_json``/``from_csv`` so a
  malformed line becomes a NULL struct and splits into (clean, bad)
  without the ``_corrupt_record`` column (whose column-pruning
  restriction would force caching the parsed corpus) — at 100 TB a
  0.01% reject rate is a million documents someone must account for;
* deterministic **doc_id assignment** for id-less corpora (file name +
  line position via a content hash would collide on exact dupes;
  ``monotonically_increasing_id`` is partition-deterministic but not
  stable across repartitions — we use the xxhash64 of the raw line,
  salted, with the collision caveat documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_csv_corpus", "read_jsonl", "write_jsonl"]

#: the documents-table shape used throughout the pipeline modules
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    assign_ids: bool = False,
    id_salt: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with malformed-line quarantine.

    Returns ``(docs, rejects)``: ``docs`` carries the schema's columns
    for lines that parsed; ``rejects`` is ``(raw_line)`` for lines
    Jackson could not parse into the schema PLUS well-formed JSON that
    carries none of the schema's fields (``{}``, ``{"other": 1}``, or
    a bare scalar) — an all-null document is useless to every
    downstream op, so quarantining it with the garbage is the intended
    contract (rejects are "lines that produced no usable document",
    not only parse failures).  Both come from ONE scan definition
    (Catalyst shares the file listing; each side prunes its own
    columns).

    ``assign_ids=True`` adds/overwrites ``doc_id`` with the salted
    xxhash64 of the parsed text — stable across runs and repartitions;
    exact-duplicate texts intentionally collide (they ARE the same
    document for every downstream dedup op).
    """
    # read lines as text and parse with from_json: a malformed line
    # parses to a NULL struct, so clean/reject split needs no
    # _corrupt_record column (whose column-pruning restriction would
    # force caching the parsed corpus — a non-starter at scale).  Both
    # branches stay one JVM-side Jackson pass fused into the scan.
    raw = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(F.col("value"), schema).alias("__j"),
    )
    # from_json is PERMISSIVE per-field: a line is a reject when the
    # whole struct is NULL (unparseable) or when every schema field is
    # NULL — which covers both non-objects AND well-formed objects
    # that simply carry none of the schema's fields ({}; {"other":1}).
    all_null = F.lit(True)
    for f0 in schema.fields:
        all_null = all_null & F.col(f"__j.{f0.name}").isNull()
    bad = raw.filter(F.col("__j").isNull() | all_null).select("raw_line")
    docs = raw.filter(F.col("__j").isNotNull() & ~all_null).select("__j.*")
    if assign_ids:
        docs = docs.withColumn(
            "doc_id", F.xxhash64(F.col("text"), F.lit(int(id_salt)))
        )
    return docs, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as (optionally gzip-compressed) JSONL shards —
    one file per partition, so shard count/size is controlled by the
    caller's ``repartition`` (the standard corpus-shard contract).
    ``partition_by`` lays out e.g. ``split=train/lang=en/`` directories
    so downstream readers partition-prune."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    sep: str = ",",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV/TSV twin of :func:`read_jsonl` — same contract (explicit
    schema, no inference pass, malformed-line quarantine via the
    ``from_csv`` NULL split), same one-JVM-pass shape.  Header lines
    are recognized textually (the exact header string) so multi-shard
    directories where every shard repeats the header stay correct.
    Caveat of that textual rule: a DATA row byte-equal to the header
    string is indistinguishable from a header and is dropped with it —
    acceptable for the corpus shapes this targets (a document row
    whose every field equals its column name is not real data); pass
    ``header=False`` on headerless shards to disable the filter.

    Returns ``(docs, rejects)``.
    """
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    header_line = sep.join(f.name for f in schema.fields)
    raw = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_csv(
            F.col("value"), ddl, {"sep": sep, "mode": "PERMISSIVE"}
        ).alias("__c"),
    )
    if header:
        raw = raw.filter(F.col("raw_line") != header_line)
    all_null = F.lit(True)
    for f0 in schema.fields:
        all_null = all_null & F.col(f"__c.{f0.name}").isNull()
    bad = raw.filter(F.col("__c").isNull() | all_null).select("raw_line")
    docs = raw.filter(F.col("__c").isNotNull() & ~all_null).select("__c.*")
    return docs, bad
