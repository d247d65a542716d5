"""Per-query rescan + timing harness for working the rescan-audit
queue: live-scan counts (the tools/rescan_audit.py walker) plus a
bench-faithful min-of-N wall time, for the named registry queries
only.

    python tools/rescan_one.py q1 [q2 ...] [--sf DIR] [--reps N]

Times are min-of-N with the cache cleared between queries (not between
reps — a persist-bearing plan's steady state INCLUDES its warm cache,
which is what bench.py measures too).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialdata_spark.session import get_spark  # noqa: E402
from tools.rescan_audit import _live_scans  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    reps = 4
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("rescan-one", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    for name in names:
        fn = q[name]
        scans = _live_scans(fn(spark, sf_dir))
        spark.catalog.clearCache()
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
        hot = {k: v for k, v in scans.items() if v >= 2}
        print(f"{name}\tmin={best:.3f}s\tscans={hot or scans}")


if __name__ == "__main__":
    main()
