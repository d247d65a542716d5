"""Repo-local ``sitecustomize``: stat-guard ``zipimporter.invalidate_caches``.

Why this file exists (round-15 optimization, measured — see
OPTIMIZATION_r15.md "Python task overhead"):

* Spark runs ``importlib.invalidate_caches()`` inside the Python worker
  for EVERY task (``pyspark/worker_util.py::setup_spark_files``), even
  when no files were added to the job.
* CPython 3.11's ``zipimport.zipimporter.invalidate_caches`` re-reads
  the archive's whole central directory EAGERLY (zipimport.py:329-336).
  Every worker has ``pyspark.zip`` (+ the py4j zip) on ``sys.path``, so
  each Python task pays a full TOC re-read: measured 130-212 ms of the
  ~220 ms fixed per-task latency of every Arrow/pandas-UDF stage on
  this machine (a 10-row ``mapInPandas`` round trip costs ~0.22 s; the
  phase instrumentation put 130-212 ms inside ``setup_spark_files``,
  and ``importlib.invalidate_caches()`` alone is ~72 ms per call with
  pyspark.zip imported).  The cost is per task on real clusters too —
  it is not a local[32] artifact.
* Newer CPython mitigates this by reloading only when the archive
  changed.  This shim backports that behavior: the TOC re-read is
  skipped while the archive's ``(mtime, size)`` is unchanged, so the
  invalidation SEMANTICS — pick up a replaced/updated zip — are fully
  preserved; only redundant re-reads of an unchanged archive are
  elided.  No query result can change: imports resolve identically.

The ``site`` module imports ``sitecustomize`` automatically in every
interpreter whose ``sys.path`` contains the repo root — the driver,
pytest, and (critically) the pyspark daemon/workers, which inherit the
repo root on ``PYTHONPATH``.
"""

import os
import zipimport

_orig_invalidate_caches = zipimport.zipimporter.invalidate_caches


def _stat_guarded_invalidate_caches(self):
    try:
        st = os.stat(self.archive)
        # nanosecond mtime: a same-size zip rewritten within coarse
        # float-mtime resolution must still be detected as changed
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None and getattr(self, "_sdspark_zip_stat", None) == key:
        return  # archive unchanged: cached TOC is still valid
    _orig_invalidate_caches(self)
    self._sdspark_zip_stat = key


# idempotent under repeated import (site + explicit imports)
if getattr(zipimport.zipimporter.invalidate_caches, "__name__", "") != (
    "_stat_guarded_invalidate_caches"
):
    zipimport.zipimporter.invalidate_caches = _stat_guarded_invalidate_caches
