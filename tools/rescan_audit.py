"""Duplicate-subtree audit: for every registry query, count how many
times the plan that actually RAN scans each parquet input.

A plan that scans one file N >= 3 times re-computes a shared subtree
N times per run — the class the r12/r13 fixes closed for
ag_points_categorical (category dictionary, 3x), the daily monitors,
and the tf/gram-table textstats family (divergent column pruning
between consumers defeats exchange reuse, so each consumer replays
the corpus tokenize + aggregate).  Re-scans at exactly 2x are usually
the documented recompute-vs-cache-write wash (measured NEGATIVE for
the quantized point projection — see aggregate.py); report them only
with --all.

Counting EXECUTES the query (collect) and walks the FINAL adaptive
plan, because two compile-time artifacts otherwise mis-report:

- AQE stage reuse: identical exchange subtrees across union branches
  materialize ONCE at runtime (ag_points_by_boxes: initialPlan shows
  3 scans per input, runtime runs 1) — the final plan shows them as
  ReusedExchangeExec and the walker credits each distinct
  materialized exchange exactly once (dedup on the JVM identity of
  the ORIGINAL exchange object every ReusedExchangeExec points at).
- InMemoryTableScanExec: a persisted subtree executes once when the
  cache materializes, then every consumer reads the cache — its
  internals must not count per-consumer (the walker stops there; the
  one materialization scan is deliberately un-counted, matching the
  r12 convention).

Iterative operators whose plan TEXT embeds cached lineage thousands
of times therefore report their true runtime scan count.

    python tools/rescan_audit.py [sf_dir] [--all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialdata_spark.session import get_spark  # noqa: E402


def _live_scans(df) -> dict[str, int]:
    """Runtime per-input scan counts: executes ``df`` and walks the
    final adaptive plan with exchange-reuse credit."""
    df.collect()
    counts: dict[str, int] = {}
    seen: set[int] = set()  # identity of materialized exchange objects

    def walk(p):
        name = p.getClass().getSimpleName()
        if name == "InMemoryTableScanExec":
            return
        if name == "AdaptiveSparkPlanExec":
            # after collect() the final plan is available; fall back to
            # the initial plan for never-executed inner adaptives
            try:
                walk(p.finalPhysicalPlan())
            except Exception:  # noqa: BLE001 — not executed
                walk(p.initialPlan())
            return
        if name.endswith("QueryStageExec"):
            inner = p.plan()
            if inner.getClass().getSimpleName() == "ReusedExchangeExec":
                inner = inner.child()  # the ORIGINAL materialized exchange
            # id() of a py4j proxy is NOT stable across references to
            # the same JVM object — dedup on the JVM identity hash
            key = _jvm_identity(inner)
            if key in seen:
                return
            seen.add(key)
            walk(inner)
            return
        if name == "ReusedExchangeExec":
            # non-AQE reuse: the original exchange appears elsewhere in
            # the tree and is walked there
            return
        if name in ("FileSourceScanExec", "BatchScanExec"):
            try:
                root = p.relation().location().rootPaths().head().toString()
                base = os.path.basename(root.rstrip("/"))
            except Exception:  # noqa: BLE001 — unknown scan shape
                base = "?"
            counts[base] = counts.get(base, 0) + 1
        ch = p.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts


def _jvm_identity(jobj) -> int:
    """Stable identity of a JVM object across py4j proxies."""
    from pyspark import SparkContext

    return int(
        SparkContext._active_spark_context._jvm.java.lang.System.identityHashCode(
            jobj
        )
    )


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    threshold = 3
    for a in sys.argv[1:]:
        if a == "--all":
            threshold = 2
        else:
            sf_dir = a
    spark = get_spark("rescan-audit", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            counts = _live_scans(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}\tERROR\t{type(e).__name__}: {e}")
            # a failed query may have materialized its per-call
            # persists before dying; without this, CacheManager plan
            # substitution hides the next query's re-scans behind
            # InMemoryTableScan (a false-negative audit row)
            spark.catalog.clearCache()
            continue
        for base, c in sorted(counts.items()):
            if c >= threshold:
                flagged.append((name, base, c))
                print(f"{name}\t{base}\t{c}x")
        spark.catalog.clearCache()
    print(
        f"SUMMARY: {len(flagged)} (query, input) pairs live-scanned >= "
        f"{threshold}x across {len(entrymod.queries())} queries"
    )


if __name__ == "__main__":
    main()
