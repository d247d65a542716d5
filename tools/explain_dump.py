"""Dump `.explain("formatted")` for named registry queries to files.

    python tools/explain_dump.py --out plans/r14 --suffix _before [--sf DIR] [q1 q2 ...]

With no query names, dumps the bench.py HEADLINE list.  One file per
query: <out>/<query><suffix>.txt.  Plans are captured at the bench scale
(sf0.1 by default) so Exchange counts / join strategies match what the
bench actually runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r14"
    suffix = "_before"
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--out":
            out_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1
    if not names:
        import bench

        names = list(bench.HEADLINE)
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        df = qs[n](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{n}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
