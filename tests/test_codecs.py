"""PNG codec + resize kernel tests (pure stdlib/numpy, no Spark)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from spatialdata_spark.pipeline.codecs import (
    _PNG_SIG,
    _chunk,
    bilinear_resize,
    png_decode,
    png_encode,
)


def test_roundtrip_shapes():
    rng = np.random.default_rng(0)
    for shape in [(8, 8), (8, 8, 3), (5, 7, 4), (1, 1, 1), (16, 3, 2)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        d = png_decode(png_encode(a))
        ref = a if a.ndim == 3 else a[:, :, None]
        assert np.array_equal(d, ref), shape


def test_decode_every_filter_type():
    """Decode a PNG whose rows use filters 0..4, built independently of
    the encoder (so this pins the unfilter math, not a roundtrip)."""
    rng = np.random.default_rng(3)
    h, w, c = 5, 6, 3
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)

    def paeth(pa, pb, pc):
        p = pa + pb - pc
        da, db, dc = abs(p - pa), abs(p - pb), abs(p - pc)
        return pa if da <= db and da <= dc else (pb if db <= dc else pc)

    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = a[y].reshape(-1).astype(np.int32)
        ft = y % 5
        filt = cur.copy()
        if ft == 1:
            for x in range(w * c - 1, c - 1, -1):
                filt[x] = (cur[x] - cur[x - c]) & 0xFF
        elif ft == 2:
            filt = (cur - prev) & 0xFF
        elif ft == 3:
            for x in range(w * c):
                left = cur[x - c] if x >= c else 0
                filt[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(w * c):
                left = int(cur[x - c]) if x >= c else 0
                ul = int(prev[x - c]) if x >= c else 0
                filt[x] = (cur[x] - paeth(left, int(prev[x]), ul)) & 0xFF
        rows.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(png), a)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = _PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(png16)


def test_bilinear_exact_on_linear_field():
    f = np.fromfunction(lambda y, x: 3 + 2 * x + 4 * y, (8, 8))
    r = bilinear_resize(f, 4, 4)[:, :, 0]
    exp = np.fromfunction(lambda oy, ox: 3 + 2 * (2 * ox + 0.5) + 4 * (2 * oy + 0.5), (4, 4))
    assert np.array_equal(r, exp)


def test_bilinear_identity():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(bilinear_resize(a, 6, 5), a.astype(float))


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from spatialdata_spark.pipeline.codecs import decode_wav, encode_wav

    t = np.arange(1600)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    payload = encode_wav(sine, 16000)
    sr, samples = decode_wav(payload)
    assert sr == 16000 and samples.shape == (1600, 1)
    np.testing.assert_array_equal(samples[:, 0], sine)
    # stereo
    st = np.stack([sine, -sine], axis=1)
    sr2, s2 = decode_wav(encode_wav(st, 8000))
    assert sr2 == 8000 and s2.shape == (1600, 2)
    np.testing.assert_array_equal(s2, st)
    # extra LIST chunk before data must be skipped
    head = payload[:12]
    rest = payload[12:]
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = b"RIFF" + struct.pack("<I", len(rest) + len(lst) + 4) + b"WAVE" + lst + rest[0:]
    sr3, s3 = decode_wav(patched)
    assert sr3 == 16000
    np.testing.assert_array_equal(s3[:, 0], sine)


def test_audio_features(spark):
    import numpy as np

    from spatialdata_spark.pipeline.codecs import encode_wav
    from spatialdata_spark.pipeline.multimodal import MEDIA_SCHEMA, audio_features

    sr = 16000
    t = np.arange(sr)  # 1 second
    loud = (20000 * np.sin(2 * np.pi * 100 * t / sr)).astype(np.int16)
    quiet = (200 * np.sin(2 * np.pi * 100 * t / sr)).astype(np.int16)
    rows = [
        (1, "audio", bytes(encode_wav(loud, sr)), "audio/wav", None, None, 1000),
        (2, "audio", bytes(encode_wav(quiet, sr)), "audio/wav", None, None, 1000),
        (3, "audio", b"not a wav", "audio/wav", None, None, 0),
        (4, "image", b"png...", "image/png", 2, 2, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_features(media, frame_ms=25).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # 1 second / 25 ms = 40 frames for each good file
    assert len(by_id[1]) == 40 and len(by_id[2]) == 40
    assert all(r["decode_ok"] for r in by_id[1])
    # loud file's RMS dominates the quiet one's frame for frame
    assert all(a["rms"] > 50 * b["rms"] for a, b in zip(by_id[1], by_id[2]))
    # 100 Hz sine: ~2 zero crossings per 25 ms frame -> zcr ~ 2/400
    assert all(0 < r["zcr"] < 0.02 for r in by_id[1])
    # bad payload -> one decode_ok=False row; image rows filtered out
    assert len(by_id[3]) == 1 and not by_id[3][0]["decode_ok"]
    assert 4 not in by_id


def test_avi_roundtrip_and_video_features(spark):
    import numpy as np

    from spatialdata_spark.pipeline.codecs import decode_avi, encode_avi
    from spatialdata_spark.pipeline.multimodal import MEDIA_SCHEMA, video_frame_features

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)]
    fps, back = decode_avi(encode_avi(frames, fps=24))
    assert fps == 24 and len(back) == 5
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)  # odd width exercises row padding

    rows = [
        (1, "video", bytes(encode_avi(frames, fps=24)), "video/avi", 9, 6, 208),
        (2, "video", b"broken", "video/avi", None, None, 0),
        (3, "audio", b"riff-ish", "audio/wav", None, None, 0),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = video_frame_features(media, every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["frame"] for r in by_id[1]] == [0, 2, 4]
    exp = frames[2].reshape(-1, 3).mean(axis=0)
    got = by_id[1][1]
    assert abs(got["mean_r"] - exp[0]) < 1e-9 and abs(got["mean_b"] - exp[2]) < 1e-9
    assert len(by_id[2]) == 1 and not by_id[2][0]["decode_ok"]
    assert 3 not in by_id  # audio rows filtered out
