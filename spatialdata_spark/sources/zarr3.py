"""Zarr v3 format support — pure stdlib, mirroring the v2 module.

Reference: the container format matrix in ``_io/format.py:56-267``
pairs container V01 with zarr v2 and V02 with zarr v3.  This module
implements the public Zarr v3 core spec surface the stores need:

* one ``zarr.json`` document per node (``node_type`` group/array)
  instead of ``.zgroup``/``.zarray``/``.zattrs``; attributes live
  inline under ``"attributes"``.
* arrays declare a ``chunk_grid`` (regular), a ``chunk_key_encoding``
  (``default`` → keys under a ``c/`` prefix, or ``v2``), and a
  ``codecs`` chain (``bytes`` + optional ``gzip``/``blosc``).

Chunk payload compression reuses the v2 module's codecs (stdlib zlib/
gzip, pure-python blosc-lz4), so executors decode v2 and v3 chunks with
the same code path.
"""

from __future__ import annotations

import numpy as np

_V3_DTYPES = {
    "float64": "<f8",
    "float32": "<f4",
    "int64": "<i8",
    "int32": "<i4",
    "int16": "<i2",
    "int8": "<i1",
    "uint64": "<u8",
    "uint32": "<u4",
    "uint16": "<u2",
    "uint8": "|u1",
    "bool": "|b1",
}
_NP_TO_V3 = {np.dtype(v): k for k, v in _V3_DTYPES.items()}


def v3_dtype_to_np(name: str) -> np.dtype:
    if name not in _V3_DTYPES:
        raise ValueError(f"unsupported zarr v3 data_type {name!r}")
    return np.dtype(_V3_DTYPES[name])


def np_dtype_to_v3(dt: np.dtype) -> str:
    dt = np.dtype(dt)
    if dt not in _NP_TO_V3:
        raise ValueError(f"dtype {dt} has no zarr v3 data_type mapping here")
    return _NP_TO_V3[dt]


def codecs_doc(codec: str | None, typesize: int) -> list[dict]:
    """Our codec name → a v3 codecs chain."""
    chain: list[dict] = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if codec is None:
        return chain
    if codec in ("zlib", "gzip"):
        # v3 has no raw-zlib codec; gzip is the stdlib-compatible choice
        chain.append({"name": "gzip", "configuration": {"level": 5}})
    elif codec == "blosc":
        chain.append(
            {
                "name": "blosc",
                "configuration": {
                    "cname": "lz4",
                    "clevel": 5,
                    "shuffle": "shuffle",
                    "typesize": typesize,
                    "blocksize": 0,
                },
            }
        )
    elif codec == "zstd":
        chain.append({"name": "zstd", "configuration": {"level": 0, "checksum": False}})
    else:
        raise ValueError(f"no zarr v3 codec mapping for {codec!r}")
    return chain


def codec_of_chain(codecs: list[dict]) -> str | None:
    """v3 codecs chain → our codec name (validates the bytes codec)."""
    names = [c.get("name") for c in codecs]
    if "bytes" not in names:
        raise ValueError(f"zarr v3 codecs chain {names} lacks the bytes codec")
    for c in codecs:
        cfg = c.get("configuration") or {}
        if c["name"] == "bytes":
            if cfg.get("endian", "little") != "little":
                raise ValueError("only little-endian zarr v3 arrays are supported")
        elif c["name"] == "gzip":
            return "gzip"
        elif c["name"] == "zstd":
            # bare zstd frames: pure-Python RFC 8878 decoder
            return "zstd"
        elif c["name"] == "blosc":
            return "blosc"
        else:
            raise ValueError(f"unsupported zarr v3 codec {c['name']!r}")
    return None


def array_meta(
    shape: tuple[int, ...],
    chunks: tuple[int, ...],
    dtype: np.dtype,
    codec: str | None,
    attrs: dict | None = None,
    separator: str = "/",
) -> dict:
    return {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": np_dtype_to_v3(dtype),
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": separator}},
        "fill_value": 0,
        "codecs": codecs_doc(codec, np.dtype(dtype).itemsize),
        "attributes": attrs or {},
    }


def group_meta(attrs: dict | None = None) -> dict:
    return {"zarr_format": 3, "node_type": "group", "attributes": attrs or {}}


def parse_array_meta(doc: dict) -> dict:
    """Normalize a v3 array ``zarr.json`` into the fields the v2 read
    paths use: shape / chunks / numpy dtype / our codec name / a chunk
    key function."""
    if doc.get("zarr_format") != 3 or doc.get("node_type") != "array":
        raise ValueError("not a zarr v3 array document")
    grid = doc.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ValueError(f"unsupported zarr v3 chunk_grid {grid.get('name')!r}")
    cke = doc.get("chunk_key_encoding", {"name": "default"})
    sep = (cke.get("configuration") or {}).get("separator", "/")
    if cke.get("name") == "default":
        def key(nums: tuple[int, ...]) -> str:
            return "c" + "".join(f"{sep}{n}" for n in nums) if nums else "c"
    elif cke.get("name") == "v2":
        def key(nums: tuple[int, ...]) -> str:
            return sep.join(str(n) for n in nums) or "0"
    else:
        raise ValueError(f"unsupported chunk_key_encoding {cke.get('name')!r}")
    return {
        "shape": tuple(doc["shape"]),
        "chunks": tuple(grid["configuration"]["chunk_shape"]),
        "dtype": v3_dtype_to_np(doc["data_type"]),
        "codec": codec_of_chain(doc.get("codecs", [])),
        "fill_value": doc.get("fill_value") or 0,
        "key": key,
        "attributes": doc.get("attributes", {}),
    }
