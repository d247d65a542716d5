"""Duplicate-subtree audit: for every registry query, count how many
times the plan that would actually RUN scans each parquet input.

A live plan that scans one file N >= 3 times re-computes a shared
subtree N times per run (Spark's ReuseExchange only collapses
canonical-identical exchanges, which dictionary/decode/branch shapes
often defeat) — the class the r12 fixes closed for
ag_points_categorical (category dictionary, 3x) and the daily-monitor
family (acf/ewma/cusum/weekday: the corpus-sized day-keyed count
replayed 3-6x for day-calendar-sized results).  Re-scans at exactly 2x
are usually the documented recompute-vs-cache-write wash (measured
NEGATIVE for the quantized point projection — see aggregate.py);
report them only with --all.

Counting walks the EXECUTED plan tree the way
tests/test_plan_guard.py::_live_shuffle_joins does — stopping at
InMemoryTableScanExec (a persisted subtree executes once when the cache
materializes, then every consumer reads the cache: its internals must
not count) and descending through AQE wrappers via initialPlan — so
iterative operators whose plan TEXT embeds cached lineage thousands of
times report their true runtime scan count.

    python tools/rescan_audit.py [sf_dir] [--all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialdata_spark.session import get_spark  # noqa: E402


def _live_scans(df) -> dict[str, int]:
    counts: dict[str, int] = {}

    def walk(p):
        name = p.getClass().getSimpleName()
        if name == "InMemoryTableScanExec":
            return
        if name == "AdaptiveSparkPlanExec":
            walk(p.initialPlan())
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
        # broadcast/exchange reuse nodes carry the reused child out of
        # band — a ReusedExchangeExec means the work is NOT re-run, so
        # its subtree is intentionally not walked (no children anyway)

    walk(df._jdf.queryExecution().executedPlan())
    return counts


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
