"""Pure-Python blosc chunk codec tests (wire-format pinned by hand-built
byte vectors, not just encoder/decoder round-trips)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spatialdata_spark.sources import blosc as B


def test_lz4_known_vectors():
    # "abcabcabcabc": literals "abc" then match offset 3 length 9
    v = bytes([0x35]) + b"abc" + bytes([0x03, 0x00])
    assert B.lz4_decompress(v, 12) == b"abcabcabcabc"
    # overlapping RLE: one literal 'x' then match offset 1 length 8
    v2 = bytes([0x14]) + b"x" + bytes([0x01, 0x00])
    assert B.lz4_decompress(v2, 9) == b"x" * 9
    # extended literal length (>=15 with 255-run extension)
    data = bytes(range(256)) * 3
    assert B.lz4_decompress(B.lz4_compress(data), len(data)) == data


def test_lz4_corrupt_raises():
    with pytest.raises(ValueError):
        B.lz4_decompress(bytes([0x10, 0x41, 0x00, 0x00]), 100)  # zero offset
    with pytest.raises(ValueError):
        B.lz4_decompress(bytes([0x35]) + b"abc" + bytes([0x03, 0x00]), 99)  # wrong size


def test_blosc_roundtrip_matrix():
    rng = np.random.default_rng(42)
    for dtype in ["u1", "u2", "i4", "f8"]:
        a = rng.integers(0, 200, size=3333).astype(dtype)
        raw = a.tobytes()
        for shuffle in (0, 1):
            for bs in (0, 512, 4096):
                c = B.blosc_compress(raw, typesize=a.dtype.itemsize, shuffle=shuffle, blocksize=bs)
                assert B.blosc_decompress(c) == raw, (dtype, shuffle, bs)


def test_blosc_zlib_inner_codec():
    raw = bytes(range(256)) * 16
    c = B.blosc_compress(raw, typesize=4, cname="zlib", shuffle=1)
    assert B.blosc_decompress(c) == raw


def test_blosc_memcpyed_chunk():
    raw = bytes(range(100))
    chunk = bytes([2, 1, B.FLAG_MEMCPYED, 1]) + struct.pack("<III", 100, 100, 116) + raw
    assert B.blosc_decompress(chunk) == raw


def test_blosc_raw_stream_when_incompressible():
    # csize == uncompressed stream size means "stored verbatim"
    raw = b"\x01\x02\x03\x04" * 8
    header = bytes([2, 1, (1 << 5) | B.FLAG_DONT_SPLIT, 4]) + struct.pack("<III", 32, 32, 16 + 4 + 4 + 32)
    chunk = header + struct.pack("<I", 20) + struct.pack("<I", 32) + raw
    assert B.blosc_decompress(chunk) == raw


def test_blosc_unsupported_paths_error_clearly():
    blosclz_flags = 0 << 5
    chunk = bytes([2, 1, blosclz_flags, 1]) + struct.pack("<III", 16, 16, 16 + 4 + 4 + 8)
    chunk += struct.pack("<I", 16 + 4) + struct.pack("<I", 8) + bytes(8)
    with pytest.raises(ValueError, match="blosclz"):
        B.blosc_decompress(chunk)
    bit = bytes([2, 1, B.FLAG_BITSHUFFLE, 1]) + struct.pack("<III", 16, 16, 36) + bytes(20)
    with pytest.raises(ValueError, match="bit-shuffle"):
        B.blosc_decompress(bit)


def test_unshuffle_inverts_shuffle():
    rng = np.random.default_rng(0)
    for ts in (2, 4, 8):
        buf = rng.integers(0, 256, size=ts * 100 + 3, dtype=np.uint8).tobytes()
        assert B._unshuffle(B._shuffle(buf, ts), ts) == buf
