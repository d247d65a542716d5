"""Pin the sitecustomize zipimporter stat-guard (r15): repeated
``invalidate_caches`` on an UNCHANGED archive must be a no-op (the
130-210 ms/task saving), while an actually-updated archive must still
be picked up — the invalidation semantics the shim promises to keep."""

from __future__ import annotations

import os
import time
import zipfile
import zipimport

import sitecustomize  # noqa: F401 — applies the patch (idempotent)


def test_patch_is_active():
    assert (
        zipimport.zipimporter.invalidate_caches.__name__
        == "_stat_guarded_invalidate_caches"
    )


def test_unchanged_archive_skips_reread_but_update_is_seen(tmp_path):
    zp = tmp_path / "m.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("sdspark_zipprobe.py", "V = 1\n")
    zi = zipimport.zipimporter(str(zp))
    assert "V = 1" in zi.get_source("sdspark_zipprobe")

    zi.invalidate_caches()  # stamps (mtime, size)
    stamp = zi._sdspark_zip_stat
    assert stamp is not None
    zi.invalidate_caches()  # unchanged: guarded no-op
    assert zi._sdspark_zip_stat == stamp
    assert "V = 1" in zi.get_source("sdspark_zipprobe")

    # rewrite the archive (different size) and force a different mtime
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("sdspark_zipprobe.py", "V = 22222222\n")
    t = time.time() + 10
    os.utime(zp, (t, t))
    zi.invalidate_caches()  # changed: full re-read
    assert zi._sdspark_zip_stat != stamp
    assert "V = 22222222" in zi.get_source("sdspark_zipprobe")
