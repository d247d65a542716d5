"""Pinned regression for the LIVE re-scan audit (r12 verdict #8 → r13):
no registry query may scan any parquet input >= 3 times AT RUNTIME
without an explicit justification entry here.

Why runtime and not plan text: the compiled plan over-reports in two
ways the audit walker credits (tools/rescan_audit.py docstring) —
AQE stage reuse materializes canonically-identical exchange subtrees
once even when the initial plan repeats them (ag_points_by_boxes:
3 compile-time scans per input, 1 runtime), and a persisted subtree
executes once at cache materialization.  A *genuine* >= 3x pair means
a corpus-sized first aggregation is replayed once per output component
— harmless at local[32] where spare cores hide it, an N x corpus-IO
multiplier at the 1000-executor design point.  The r12/r13 fix batches
took the registry from 41 flagged pairs to ZERO.

The walk executes every registry query once at sf0.001 (the same cost
class as the whole-registry oracle parity gate) and clears the cache
between queries so per-call persists don't leak across rows.

Non-vacuousness pins: a synthetic 3-consumer un-persisted plan must be
flagged; a union of canonically identical aggregations must be credited
as ONE runtime scan (the AQE-reuse case); a persisted 3-consumer plan
must report zero extra scans.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rescan_audit import _live_scans  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# {(query, input_basename): rationale} — justified survivors only; an
# entry here must cite the in-code comment carrying the same rationale
# (the aggregate.py quantized-projection precedent).  Currently EMPTY:
# the r13 batch cleared the whole queue.
JUSTIFIED: dict[tuple[str, str], str] = {}


def _family(name: str) -> str:
    """Operator-family key: queries that could share a persisted
    intermediate (same operator over the same inputs) always share
    their first two name tokens (ag_points_*, pl_ngram_*, ...)."""
    parts = name.split("_")
    return "_".join(parts[:2]) if len(parts) > 1 else name


def test_registry_runtime_rescans(spark):
    """Executes in FAMILY-AWARE WAVES (r15, suite-runtime fix): the
    audit's cache-isolation requirement is that no concurrently-running
    query can satisfy another's scan from a persist it created — only
    same-operator-same-input queries share canonicalized persist plans,
    and those always share a family key, so each wave takes at most one
    query per family and the cache is cleared between waves.  Plan
    CONSTRUCTION stays on this thread (operators resolve fixed-name temp
    views at build time); only the collect+walk fans out.  Semantics
    unchanged, wall clock ~248 s -> ~80 s of the suite's slowest test."""
    from concurrent.futures import ThreadPoolExecutor
    from collections import defaultdict

    import __spark_entry__ as em

    fams: dict[str, list] = defaultdict(list)
    for name, fn in sorted(em.queries().items()):
        fams[_family(name)].append((name, fn))

    flagged = []
    depth = max(len(v) for v in fams.values())
    for i in range(depth):
        wave = [v[i] for v in fams.values() if len(v) > i]
        built = [(name, fn(spark, SF_DIR)) for name, fn in wave]
        with ThreadPoolExecutor(max_workers=8) as pool:
            for name, counts in pool.map(lambda nd: (nd[0], _live_scans(nd[1])), built):
                for base, c in sorted(counts.items()):
                    if c >= 3 and (name, base) not in JUSTIFIED:
                        flagged.append((name, base, c))
        spark.catalog.clearCache()
    assert not flagged, (
        "runtime re-scans >= 3x without a JUSTIFIED entry (persist the "
        f"shared first aggregation or justify in-code + here): {flagged}"
    )


def test_walker_flags_unpersisted_three_consumer_plan(spark):
    """Non-vacuousness: three consumers of one un-persisted NARROW
    shared subtree (a projection — no exchange below the divergence
    point, so AQE stage reuse has nothing to merge and each union
    branch replays the scan).  This is exactly the flagged production
    class: consumers diverging below any exchange boundary."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    per = docs.select("source", F.length("text").alias("L"))
    a = per.agg(F.sum("L").alias("v"))
    b = per.filter(F.col("L") > 10).agg(F.count(F.lit(1)).alias("v"))
    c = per.agg(F.max("L").alias("v"))
    out = a.unionByName(b).unionByName(c)
    counts = _live_scans(out)
    assert counts.get("documents.parquet", 0) >= 3, counts


def test_walker_credits_aqe_stage_reuse(spark):
    """A union of canonically IDENTICAL branches materializes its
    shuffle stage once — the walker must not over-count it."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    out = per.unionByName(per).unionByName(per)
    counts = _live_scans(out)
    assert counts.get("documents.parquet", 0) == 1, counts


def test_walker_credits_persisted_subtree(spark):
    """The three-consumer shape from the first pin, persisted: every
    consumer reads the cache, so no file scan is counted per-consumer
    (the materialization scan is deliberately un-counted — the r12
    InMemoryTableScan convention)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        a = per.agg(F.sum("c").alias("v"))
        b = per.filter(F.col("c") > 1).agg(F.count(F.lit(1)).alias("v"))
        c = per.agg(F.max("c").alias("v"))
        out = a.unionByName(b).unionByName(c)
        counts = _live_scans(out)
        assert counts.get("documents.parquet", 0) == 0, counts
    finally:
        per.unpersist()
