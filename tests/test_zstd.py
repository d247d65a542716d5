"""Pure-Python zstd / snappy decoder tests.

Two layers of pinning: (1) committed fixtures produced by pyarrow's
bundled *real* libzstd / snappy (``fixtures/make_zstd_fixture.py``) so
the decoders are checked against fixed reference-compressor bytes with
no compressor in the loop at test time; (2) live pyarrow round-trips
across compression levels and data shapes, so coverage isn't limited
to whatever the fixtures happened to exercise."""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from spatialdata_spark.sources import blosc as B
from spatialdata_spark.sources.zstd import zstd_compress_stored, zstd_decompress

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "zstd")

try:
    import pyarrow as pa

    pa.Codec("zstd")
    HAVE_PA = True
except Exception:  # pragma: no cover
    HAVE_PA = False


# ---------------------------------------------------------------------------
# committed reference-compressor fixtures
# ---------------------------------------------------------------------------


def _fixture_names():
    return sorted(
        os.path.basename(p)[:-4] for p in glob.glob(os.path.join(FIXDIR, "*.raw"))
    )


@pytest.mark.parametrize("name", _fixture_names())
def test_zstd_committed_fixtures(name):
    with open(os.path.join(FIXDIR, f"{name}.raw"), "rb") as f:
        raw = f.read()
    with open(os.path.join(FIXDIR, f"{name}.zst"), "rb") as f:
        comp = f.read()
    assert zstd_decompress(comp) == raw


@pytest.mark.parametrize("name", _fixture_names())
def test_snappy_committed_fixtures(name):
    with open(os.path.join(FIXDIR, f"{name}.raw"), "rb") as f:
        raw = f.read()
    with open(os.path.join(FIXDIR, f"{name}.snappy"), "rb") as f:
        comp = f.read()
    assert B.snappy_decompress(comp) == raw


# ---------------------------------------------------------------------------
# live round-trips against real libzstd / snappy
# ---------------------------------------------------------------------------


def _live_cases():
    rng = np.random.default_rng(7)
    text = " ".join(
        ["the", "quick", "brown", "fox"][i % 4] * (1 + i % 5) for i in range(3000)
    ).encode()
    return {
        "empty": b"",
        "one": b"x",
        "text": text,
        "random": rng.bytes(4096),
        "zeros": b"\0" * 100000,
        "i64": np.arange(40000, dtype=np.int64).tobytes(),
        "multiblock": rng.bytes(50000) + text * 10 + rng.bytes(50000),
    }


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_zstd_decodes_real_libzstd(level):
    for name, data in _live_cases().items():
        comp = pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)
        assert zstd_decompress(comp) == data, (name, level)


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_zstd_concatenated_frames():
    c = pa.Codec("zstd")
    a, b = b"left" * 500, np.arange(999, dtype=np.int16).tobytes()
    assert zstd_decompress(c.compress(a, asbytes=True) + c.compress(b, asbytes=True)) == a + b


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_zstd_skippable_frame_is_skipped():
    c = pa.Codec("zstd")
    skip = struct.pack("<II", 0x184D2A50, 5) + b"extra"
    body = b"payload" * 100
    assert zstd_decompress(skip + c.compress(body, asbytes=True)) == body


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_stored_encoders_read_by_reference_impls():
    for data in (b"", b"q", b"chunk" * 5000, np.arange(60000, dtype=np.int32).tobytes()):
        st = zstd_compress_stored(data)
        assert zstd_decompress(st) == data
        got = pa.Codec("zstd").decompress(st, decompressed_size=len(data), asbytes=True)
        assert got == data
        sn = B.snappy_compress(data)
        assert B.snappy_decompress(sn) == data
        got = pa.Codec("snappy").decompress(sn, decompressed_size=len(data), asbytes=True)
        assert got == data


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_snappy_decodes_real_snappy():
    for name, data in _live_cases().items():
        comp = pa.Codec("snappy").compress(data, asbytes=True)
        assert B.snappy_decompress(comp) == data, name


# ---------------------------------------------------------------------------
# decoder error paths
# ---------------------------------------------------------------------------


def test_zstd_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x01\x02\x03rest")


def test_zstd_truncated_raises():
    with open(os.path.join(FIXDIR, "text_lvl3.zst"), "rb") as f:
        comp = f.read()
    with pytest.raises((ValueError, IndexError)):
        zstd_decompress(comp[: len(comp) // 2])


def test_snappy_bad_offset_raises():
    # copy element with offset past the start of the output
    bad = bytes([4, 0x01 | (2 << 2), 0xFF])
    with pytest.raises(ValueError):
        B.snappy_decompress(bad)


# ---------------------------------------------------------------------------
# blosc chunks with zstd / snappy inner streams
# ---------------------------------------------------------------------------


def test_blosc_compress_zstd_snappy_roundtrip():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 200, size=4096).astype("i4").tobytes()
    for cname in ("zstd", "snappy"):
        for shuffle in (0, 1):
            c = B.blosc_compress(raw, typesize=4, cname=cname, shuffle=shuffle)
            assert B.blosc_decompress(c) == raw, (cname, shuffle)


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_bare_zstd_zarr_store(spark, tmp_path):
    """zarr v2 store with a numcodecs-style ``{"id": "zstd"}`` compressor
    (bare zstd frames, produced here by real libzstd) reads through the
    tile reader; the write path emits real greedy-LZ frames any zstd
    accepts."""
    import json

    from spatialdata_spark.sources.zarrio import read_zarr_tiles

    store = tmp_path / "image" / "0"
    store.mkdir(parents=True)
    zarray = {
        "zarr_format": 2,
        "shape": [1, 8, 8],
        "chunks": [1, 8, 8],
        "dtype": "<f8",
        "compressor": {"id": "zstd", "level": 3},
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    (store / ".zarray").write_text(json.dumps(zarray))
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float64)
    raw = np.ascontiguousarray(yy * 3.0 + xx).tobytes()
    (store / "0.0.0").write_bytes(pa.Codec("zstd").compress(raw, asbytes=True))
    tiles, meta = read_zarr_tiles(spark, str(store))
    rows = tiles.collect()
    assert len(rows) == 1
    got = np.frombuffer(bytes(rows[0]["tile"]), dtype="f8").reshape(8, 8)
    assert np.array_equal(got, yy * 3.0 + xx)


def test_blosc_zstd_store_fixture(spark):
    """Committed zarr v2 store whose blosc chunks carry real libzstd
    streams (shuffled single-stream, unshuffled, split-stream, and
    blosc_compress output) decodes through the distributed tile reader
    (interop target: numcodecs.Blosc(cname='zstd') stores)."""
    from pyspark.sql import functions as F  # noqa: F401

    from spatialdata_spark.sources.zarrio import read_zarr_tiles

    p = os.path.join(os.path.dirname(FIXDIR), "zstd_store", "image", "0")
    tiles, meta = read_zarr_tiles(spark, p)
    assert (meta.height, meta.width, meta.tile) == (16, 16, 8)
    got = {
        (r["ty"], r["tx"]): np.frombuffer(bytes(r["tile"]), dtype="f8").reshape(8, 8)
        for r in tiles.collect()
    }
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float64)
    exp = {
        (0, 0): np.full((8, 8), 7.0),
        (0, 1): yy * 10.0 + xx,
        (1, 0): xx * 2.0 + 1.0,
        (1, 1): yy - xx,
    }
    assert set(got) == set(exp)
    for k in exp:
        assert np.array_equal(got[k], exp[k]), k


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_real_compressor_read_by_reference_impl():
    """zstd_compress (greedy LZ + predefined-FSE sequences) round-trips
    through BOTH this module's decoder and real libzstd, and actually
    compresses repetitive data."""
    from spatialdata_spark.sources.zstd import zstd_compress

    rng = np.random.default_rng(12)
    text = (b"the quick brown spark zarr chunk " * 3000)
    cases = [b"", b"q", text, rng.bytes(5000), b"\0" * 50000,
             text + rng.bytes(20000) + text]
    for data in cases:
        enc = zstd_compress(data)
        assert zstd_decompress(enc) == data
        got = pa.Codec("zstd").decompress(enc, decompressed_size=len(data), asbytes=True)
        assert got == data
    assert len(zstd_compress(text)) < len(text) // 10  # really compresses


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_real_compressor_fuzz_vs_libzstd():
    import random

    from spatialdata_spark.sources.zstd import zstd_compress

    random.seed(4)
    words = [b"aaaa", b"bbbb", b"cc", b"dddddd", b"\x00\x00\x00\x00"]
    for _ in range(500):
        data = b"".join(random.choice(words) for _ in range(random.randint(0, 40)))
        data += bytes(random.randint(0, 255) for _ in range(random.randint(0, 12)))
        enc = zstd_compress(data)
        assert zstd_decompress(enc) == data
        assert pa.Codec("zstd").decompress(enc, decompressed_size=len(data), asbytes=True) == data


def test_fse_encoder_roundtrips_default_tables():
    """Single-channel FSE encode/decode round-trip over the three
    predefined distributions (the encoder mirror of the decode tables)."""
    import random

    from spatialdata_spark.sources.zstd import (
        _ML_DEFAULTS,
        _LL_DEFAULTS,
        _OF_DEFAULTS,
        _BackwardBits,
        _BitWriter,
        _FseEncTable,
        _FseTable,
    )

    random.seed(2)
    for counts, acc in [(_LL_DEFAULTS, 6), (_ML_DEFAULTS, 6), (_OF_DEFAULTS, 5)]:
        enc = _FseEncTable(counts, acc)
        dec = _FseTable(counts, acc)
        alphabet = [s for s, c in enumerate(counts) if c != 0]
        for _ in range(200):
            syms = [random.choice(alphabet) for _ in range(random.randint(1, 30))]
            w = _BitWriter()
            state = enc.init_state(syms[-1])
            for s in reversed(syms[:-1]):
                state = enc.encode(state, s, w)
            enc.flush(state, w)
            bits = _BackwardBits(w.close())
            st = bits.read(acc)
            out = []
            for i in range(len(syms)):
                out.append(dec.symbols[st])
                if i + 1 < len(syms):
                    st = dec.base[st] + bits.read(dec.nb_bits[st])
            assert out == syms


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_huffman_literals_compress_and_decode_by_libzstd():
    """ASCII-alphabet blocks get Huffman-coded literals (package-merge
    length-limited canonical codes, direct-weight header) — verified by
    real libzstd decoding the output."""
    import random

    from spatialdata_spark.sources.zstd import zstd_compress

    random.seed(6)
    skewed = bytes(random.choice(b"aaaaaaabbbc") for _ in range(20000))
    enc = zstd_compress(skewed)
    assert len(enc) < len(skewed) * 0.6  # really entropy-coded
    assert zstd_decompress(enc) == skewed
    assert pa.Codec("zstd").decompress(enc, decompressed_size=len(skewed), asbytes=True) == skewed
    # > 1023 literals exercises the 4-stream path; < 1024 the 1-stream path
    small = bytes(random.choice(b"xxyyz") for _ in range(600)) + b"\xff" * 0
    enc2 = zstd_compress(small + np.random.default_rng(0).bytes(3))
    assert zstd_decompress(enc2) == small + np.random.default_rng(0).bytes(3)


def test_package_merge_kraft_equality():
    import random

    from spatialdata_spark.sources.zstd import _package_merge

    random.seed(8)
    for _ in range(200):
        n = random.randint(2, 100)
        freqs = {s: random.randint(1, 10000) for s in range(n)}
        lens = _package_merge(freqs, 11)
        assert max(lens.values()) <= 11
        assert sum(2 ** (11 - l) for l in lens.values()) == 2**11  # complete code


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_fse_weight_descriptions_full_alphabet():
    """Alphabets with symbols >= 128 use FSE-compressed Huffman weight
    descriptions; real libzstd decodes the result (float64 data now
    entropy-codes at libzstd-3 parity)."""
    from spatialdata_spark.sources.zstd import zstd_compress

    data = (np.sin(np.arange(30000)) * 1000).astype(np.float64).tobytes()
    enc = zstd_compress(data)
    assert len(enc) < len(data)  # really compresses despite no LZ matches
    assert zstd_decompress(enc) == data
    assert pa.Codec("zstd").decompress(enc, decompressed_size=len(data), asbytes=True) == data


def test_ncount_writer_roundtrips_reader():
    import random

    from spatialdata_spark.sources.zstd import (
        _ForwardBits,
        _fse_read_ncount,
        _fse_write_ncount,
        _normalize_counts,
    )

    random.seed(3)
    for _ in range(300):
        nsym = random.randint(2, 13)
        hist = {s: random.randint(1, 1000) for s in random.sample(range(13), nsym)}
        counts = _normalize_counts(hist, 6, max(hist))
        data = _fse_write_ncount(counts, 6)
        got, acc = _fse_read_ncount(_ForwardBits(data), 255)
        strip = lambda xs: xs[: len(xs) - next((i for i, v in enumerate(reversed(xs)) if v), len(xs))]
        assert acc == 6 and strip(got) == strip(counts)


def test_fse_weight_stream_roundtrip():
    import random

    from spatialdata_spark.sources.zstd import (
        _BackwardBits,
        _ForwardBits,
        _FseTable,
        _fse_compress_weights,
        _fse_decompress_interleaved,
        _fse_read_ncount,
    )

    random.seed(4)
    for _ in range(300):
        nw = random.randint(2, 255)
        weights = [random.randint(0, 11) for _ in range(nw)]
        if all(w == weights[0] for w in weights):
            weights[0] = (weights[0] + 1) % 12
        comp = _fse_compress_weights(weights)
        if comp is None:
            continue
        fwd = _ForwardBits(comp)
        counts, acc = _fse_read_ncount(fwd, 255)
        got = _fse_decompress_interleaved(
            _FseTable(counts, acc), _BackwardBits(comp[fwd.bytes_consumed():]), 255
        )
        assert got == weights


def test_match_offset_cannot_reach_previous_frame():
    """RFC 8878 window semantics: a match offset is bounded by the
    START OF THE CURRENT FRAME, not the start of the shared output
    buffer.  A corrupt second frame whose offset reaches into the first
    frame's output must raise, never silently copy foreign bytes.

    The second frame is hand-assembled: one compressed block with zero
    raw literals and a single sequence under RLE symbol tables
    (ll=0 -> lit_len 0; ml=0 -> match_len 3; of=3 -> offset_value
    8+read(3)=8 -> offset 5) — valid standalone structure, but offset 5
    with zero bytes of frame-local history."""
    from spatialdata_spark.sources.zstd import zstd_decompress

    frame1 = (
        b"\x28\xb5\x2f\xfd"  # magic
        + b"\x20\x05"        # single-segment, content size 5
        + b"\x29\x00\x00"    # raw block, last, size 5
        + b"HELLO"
    )
    block = bytes(
        [
            0x00,  # literals: raw, size 0
            0x01,  # one sequence
            0x54,  # modes: LL/OF/ML all RLE
            0x00,  # LL RLE symbol 0
            0x03,  # OF RLE symbol 3
            0x00,  # ML RLE symbol 0
            0x08,  # backward bitstream: sentinel + 3 zero bits
        ]
    )
    frame2 = (
        b"\x28\xb5\x2f\xfd"
        + b"\x20\x03"  # single-segment, content size 3
        + bytes([1 | (2 << 1) | (len(block) << 3), 0x00, 0x00])
        + block
    )
    with pytest.raises(ValueError, match="frame start"):
        zstd_decompress(frame1 + frame2)
    # the same offset is fine when the frame itself has the history
    frame_ok = (
        b"\x28\xb5\x2f\xfd"
        + b"\x20\x08"        # content: 5 raw + 3 matched
        + b"\x28\x00\x00"    # raw block, NOT last, size 5
        + b"HELLO"
        + bytes([1 | (2 << 1) | (len(block) << 3), 0x00, 0x00])
        + block
    )
    assert zstd_decompress(frame_ok) == b"HELLOHEL"


# ---------------------------------------------------------------------------
# XXH64 + zstd content checksums
# ---------------------------------------------------------------------------


def test_xxh64_canonical_and_spark_pin(spark):
    """Pin the pure-Python XXH64 against (a) the spec's canonical
    empty-string value and (b) Spark's own JVM XXH64 (F.xxhash64 on
    binary, seed 42) across every length branch of the algorithm —
    an independent in-container reference implementation."""
    import random

    from pyspark.sql import functions as F

    from spatialdata_spark.sources.xxhash import xxh64

    assert xxh64(b"", 0) == 0xEF46DB3751D8E999

    rng = random.Random(7)
    blobs = [
        bytes(rng.randrange(256) for _ in range(n))
        for n in [0, 1, 3, 4, 7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 100, 255, 1024]
    ]
    df = spark.createDataFrame(list(enumerate(blobs)), ["i", "b"])
    got = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("b").alias("h")).collect()}
    for i, b in enumerate(blobs):
        h = xxh64(b, 42)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert got[i] == signed, f"len {len(b)}"


@pytest.mark.skipif(not HAVE_PA, reason="pyarrow codecs unavailable")
def test_zstd_checksummed_frames_verified_by_libzstd_and_us():
    """checksum=True frames must satisfy REAL libzstd (which verifies
    Content_Checksum itself — a wrong XXH64 would make pyarrow raise),
    and our decoder must verify too: a flipped payload byte or a
    flipped stored checksum raises instead of returning bytes."""
    import pyarrow as pa

    from spatialdata_spark.sources.zstd import zstd_compress

    codec = pa.Codec("zstd")
    data = bytes(range(256)) * 41 + b"tail" + b"\x00" * 999
    comp = zstd_compress(data, checksum=True)
    assert codec.decompress(comp, decompressed_size=len(data)).to_pybytes() == data
    assert zstd_decompress(comp) == data

    bad = bytearray(comp)
    bad[-1] ^= 0xFF  # stored checksum corrupted
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))


def test_zstd_checksum_detects_tamper_roundtrip():
    from spatialdata_spark.sources.zstd import zstd_compress

    data = b"the quick brown fox " * 200
    comp = zstd_compress(data, checksum=True)
    assert zstd_decompress(comp) == data
    assert zstd_decompress(zstd_compress(data)) == data  # default: no checksum
