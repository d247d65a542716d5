"""Store fetchers: one small abstraction between the zarr/container IO
and the bytes, so the same read code serves local directories and
remote (http/https) stores.

Reference parity: the reference reads zarr stores over http(s) and
remote parquet through ``simplecache::``-wrapped fsspec URLs
(_io/io_zarr.py:125-168, _io/io_points.py:37).  The analogs here:

* :class:`LocalFetcher` — plain filesystem, supports listing.
* :class:`HttpFetcher` — stdlib urllib GETs.  Object/http stores have
  no directory listing, so hierarchy discovery comes from consolidated
  metadata (``.zmetadata``) and chunk discovery from the ``.zarray``
  shape/chunks grid (missing chunk = fill value — the zarr contract);
  parquet part files are named by the store's write-time file manifest
  and cached to a local temp dir before ``spark.read.parquet`` (the
  ``simplecache::`` analog).

Fetchers are tiny picklable value objects: executors fetch chunk
payloads themselves, so a 1000-executor cluster pulls 1000 chunks
concurrently with no driver bottleneck.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import urllib.error
import urllib.request


class LocalFetcher:
    """Filesystem-backed store access rooted at ``root``."""

    can_list = True

    def __init__(self, root: str):
        self.root = root

    def _p(self, rel: str) -> str:
        return os.path.join(self.root, *rel.split("/")) if rel else self.root

    def get(self, rel: str) -> bytes | None:
        p = self._p(rel)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    def get_json(self, rel: str) -> dict | None:
        b = self.get(rel)
        return None if b is None else json.loads(b)

    def list_dir(self, rel: str = "") -> list[str] | None:
        p = self._p(rel)
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def is_dir(self, rel: str) -> bool:
        return os.path.isdir(self._p(rel))

    def local_dir(self, rel: str, files: list[str] | None = None) -> str:
        """Local directory path for ``rel`` (no copy needed)."""
        return self._p(rel)


class HttpFetcher:
    """http(s)-backed store access.  No listing: callers must know the
    keys (from ``.zmetadata``, the ``.zarray`` grid, or the manifest)."""

    can_list = False

    def __init__(self, base_url: str, cache_dir: str | None = None, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._cache_dir = cache_dir

    def _u(self, rel: str) -> str:
        return f"{self.base_url}/{rel}" if rel else self.base_url

    def get(self, rel: str) -> bytes | None:
        try:
            with urllib.request.urlopen(self._u(rel), timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        except urllib.error.URLError as e:
            raise IOError(f"cannot fetch {self._u(rel)}: {e}") from e

    def get_json(self, rel: str) -> dict | None:
        b = self.get(rel)
        return None if b is None else json.loads(b)

    def list_dir(self, rel: str = "") -> list[str] | None:
        return None  # http has no directory listing

    def is_dir(self, rel: str) -> bool:
        # undecidable over plain http; consolidated metadata answers this
        return False

    def local_dir(self, rel: str, files: list[str] | None = None) -> str:
        """Download ``files`` under the ``rel`` prefix into a local
        cache directory and return its path — the ``simplecache::``
        analog for reading remote parquet with Spark."""
        if not files:
            raise ValueError(
                f"remote parquet read of {self._u(rel)} needs the store's file "
                "manifest (write with consolidate_metadata) to know part names"
            )
        if self._cache_dir is None:
            self._cache_dir = tempfile.mkdtemp(prefix="sdspark-httpcache-")
        tag = hashlib.sha1(f"{self.base_url}/{rel}".encode()).hexdigest()[:16]
        d = os.path.join(self._cache_dir, tag)
        os.makedirs(d, exist_ok=True)
        for fn in files:
            dest = os.path.join(d, fn.replace("/", "_"))
            if os.path.exists(dest):
                continue
            b = self.get(f"{rel}/{fn}" if rel else fn)
            if b is None:
                raise FileNotFoundError(self._u(f"{rel}/{fn}"))
            with open(dest, "wb") as f:
                f.write(b)
        return d


def fetcher_for(path_or_url: str):
    """Dispatch a store location string to the right fetcher."""
    if path_or_url.startswith(("http://", "https://")):
        return HttpFetcher(path_or_url)
    return LocalFetcher(path_or_url)
