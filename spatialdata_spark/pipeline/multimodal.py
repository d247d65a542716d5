"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Image decode / feature extraction / resize are **real** for PNG
payloads: the container has no PIL/ffmpeg, but PNG is zlib + scanline
filters, both implementable with the stdlib — see
``pipeline/codecs.py``.  Non-PNG payloads (JPEG, audio, video) fall
back to a deterministic sha256 stub with ``decode_ok=False`` so fake
features can never be mistaken for real ones; a real deployment swaps
the kernel for PIL/libvips/ffmpeg and nothing else changes — the
mapInPandas plumbing (schemas, Arrow batching, partition sizing) is
the part this module owns.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spatialdata_spark.pipeline.codecs import bilinear_resize, png_decode, png_encode

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

#: feature layout for decoded images:
#: [height, width, channels, mean_c0, mean_c1, mean_c2, min, max]
N_FEATURES = 8


def _image_features(arr: np.ndarray) -> list[float]:
    h, w, c = arr.shape
    a = arr.astype(np.float64)
    means = [float(a[:, :, i].mean()) for i in range(min(c, 3))]
    means += [0.0] * (3 - len(means))
    return [float(h), float(w), float(c), *means, float(a.min()), float(a.max())]


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fallback for payloads with no available codec —
    paired with decode_ok=False, never with True."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:N_FEATURES]]


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas.

    PNG images are decoded for real (pipeline/codecs.py) and yield the
    8-value stat feature with ``decode_ok=True``; everything else gets
    the sha256 stub with ``decode_ok=False``.  Payloads are large — the
    iterator form processes one Arrow batch at a time so executor
    memory stays bounded; repartition upstream by ``media_id`` if
    payload skew is observed.
    """

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            feats = []
            ok = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                try:
                    feats.append(_image_features(png_decode(raw)))
                    ok.append(True)
                except Exception:
                    feats.append(_stub_features(raw))
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats, "decode_ok": ok})

    return media.mapInPandas(_gen, FEATURE_SCHEMA)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual DIFFERENCE HASH (dHash, the classic gradient
    fingerprint: Krawetz's "Kind of Like That") per image — the
    image-side analog of the text pipeline's SimHash: near-identical
    images (re-encodes, brightness shifts that preserve gradients)
    land on nearby hashes, so exact-duplicate groups fall out of one
    groupBy and near-dups out of the SimHash family's Hamming
    band-join machinery.

    Exactness contract (so a SQL oracle can recompute the hash from a
    closed-form pixel fixture): grayscale is the INTEGER mean
    ``(r + g + b) // 3`` (no float luma weights; RGBA drops alpha,
    gray+alpha uses the luma plane), one bit per
    horizontally-adjacent pair — ``bit(y, x) = gray(y, x+1) >
    gray(y, x)`` — packed row-major, LSB first:
    ``hash = sum bit << (y*(w-1) + x)``.  The standard recipe
    downsizes to 9x8 first; this operator hashes the DECODED image at
    native resolution (compose :func:`resize_images` upstream for the
    classic 9x8 form) and requires ``(w-1)*h <= 63`` so the hash fits
    a signed int64.

    Output: ``(media_id, dhash, decode_ok)``; undecodable payloads get
    a sha256-derived stub hash with ``decode_ok=False`` (the stub
    convention of :func:`extract_features`).  A payload that DECODES
    but violates the size precondition raises — it is a pipeline
    misconfiguration (missing resize), not a bad input row.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def _hash(arr: np.ndarray, media_id: int) -> int:
        if arr.ndim == 3:
            if arr.shape[-1] >= 3:
                # slice to the COLOR channels: RGBA's alpha plane must
                # not enter the documented (r+g+b)//3 mean
                gray = arr[..., :3].astype(np.int64).sum(axis=-1) // 3
            else:
                # gray+alpha: the luma plane IS the grayscale
                gray = arr[..., 0].astype(np.int64)
        else:
            gray = arr.astype(np.int64)
        h, w = gray.shape
        if (w - 1) * h > 63:
            # name the offending row: on a large corpus the executor
            # stack trace is the only triage surface
            raise ValueError(
                f"image_dhash: media_id={media_id}: {h}x{w} needs "
                f"{(w - 1) * h} bits > 63 — resize_images down first"
            )
        bits = (gray[:, 1:] > gray[:, :-1]).flatten()
        return int(sum(int(b) << i for i, b in enumerate(bits)))

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, hashes, ok = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                ids.append(int(media_id))
                # only DECODE failures take the stub path; a decodable
                # image that violates the (w-1)*h <= 63 precondition
                # must fail LOUDLY (ValueError from _hash), never be
                # misreported as decode_ok=False — swallowing it made
                # un-resized corpora silently dedup to zero groups
                try:
                    arr = png_decode(raw)
                except Exception:
                    digest = hashlib.sha256(raw).digest()
                    hashes.append(int.from_bytes(digest[:8], "big") >> 1)
                    ok.append(False)
                else:
                    hashes.append(_hash(arr, int(media_id)))
                    ok.append(True)
            yield pd.DataFrame({"media_id": ids, "dhash": hashes, "decode_ok": ok})

    return media.mapInPandas(_gen, schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Bilinear-resize PNG image payloads to (width, height) and
    re-encode; output metadata reflects the new size.  Quantization is
    half-up (floor(v + 0.5)) — deterministic across platforms.  Non-PNG
    payloads pass through unchanged apart from the metadata rewrite
    (the no-codec fallback, same shape a PIL kernel would fill)."""

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for payload in out["payload"]:
                raw = bytes(payload)
                try:
                    arr = png_decode(raw)
                    resized = np.floor(bilinear_resize(arr, height, width) + 0.5).astype(np.uint8)
                    payloads.append(png_encode(resized))
                except Exception:
                    payloads.append(raw)
            out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(_gen, MEDIA_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled timestamp.
    No video codec exists in this container, so the frame payload is a
    deterministic slice hash (stub, clearly marked); the row fan-out,
    schema and batching are the real contract."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                dur = int(dur) if dur is not None else 0
                for ts in range(0, max(dur, 1), every_ms):
                    digest = hashlib.sha256(bytes(payload) + ts.to_bytes(8, "little")).digest()
                    rows.append((int(mid), ts, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "frame"])

    return media.filter(F.col("kind") == "video").mapInPandas(_gen, schema)


def audio_features(media: DataFrame, frame_ms: int = 25) -> DataFrame:
    """Framewise audio features from WAV payloads: per-frame RMS energy
    and zero-crossing rate — the audio analog of the image feature
    extractor (real RIFF/PCM16 parse in ``codecs.decode_wav``; payloads
    that fail to parse are skipped with ``decode_ok=False`` rows, same
    contract as image decode).  One row per (media, frame); the decode
    is a narrow Arrow map, frames never shuffle."""
    import pandas as pd

    from spatialdata_spark.pipeline.codecs import decode_wav

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zcr", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def _gen(batches):
        for pdf in batches:
            ids, frames, rms_l, zcr_l, oks = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                try:
                    sr, samples = decode_wav(bytes(row.payload))
                    mono = samples.astype(np.float64).mean(axis=1)
                    flen = max(1, int(sr * frame_ms / 1000))
                    n_frames = len(mono) // flen
                    for f in range(n_frames):
                        seg = mono[f * flen : (f + 1) * flen]
                        ids.append(int(row.media_id)); frames.append(f)
                        rms_l.append(float(np.sqrt(np.mean(seg * seg))))
                        zcr_l.append(float(np.mean(np.abs(np.diff(np.signbit(seg).astype(int))))))
                        oks.append(True)
                except Exception:
                    ids.append(int(row.media_id)); frames.append(-1)
                    rms_l.append(0.0); zcr_l.append(0.0); oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "frame": frames, "rms": rms_l, "zcr": zcr_l, "decode_ok": oks}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(_gen, schema)


def video_frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Real video decode path: parse RIFF/AVI payloads
    (``codecs.decode_avi``), keep every ``every_n``-th frame, and emit
    per-frame channel means — one row per sampled frame, narrow Arrow
    map.  Non-AVI payloads become ``decode_ok=False`` rows (the stub
    ``sample_video_frames`` remains for payload-agnostic sampling)."""
    import pandas as pd

    from spatialdata_spark.pipeline.codecs import decode_avi

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def _gen(batches):
        for pdf in batches:
            ids, frs, mr, mg, mb, oks = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                try:
                    _, frames = decode_avi(bytes(row.payload))
                    for i in range(0, len(frames), every_n):
                        m = frames[i].reshape(-1, 3).mean(axis=0)
                        ids.append(int(row.media_id)); frs.append(i)
                        mr.append(float(m[0])); mg.append(float(m[1])); mb.append(float(m[2]))
                        oks.append(True)
                except Exception:
                    ids.append(int(row.media_id)); frs.append(-1)
                    mr.append(0.0); mg.append(0.0); mb.append(0.0); oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "frame": frs, "mean_r": mr, "mean_g": mg,
                 "mean_b": mb, "decode_ok": oks}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(_gen, schema)
