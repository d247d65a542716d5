"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The decode/resize/frame-sample kernels require codec libraries not in
this container, so the *kernels* are stubbed deterministically; the
Spark-side plumbing — schemas, batching, mapInPandas signatures,
partition sizing — is real and tested.  Swap `_decode_stub` for a
PIL/ffmpeg call on a real cluster and nothing else changes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_stub(payload: bytes, kind: str):
    """Deterministic fake decode: a 16-dim feature from the payload hash.

    A real deployment replaces this with PIL/torchaudio/ffmpeg decode —
    marked clearly so nobody mistakes the fake features for real ones.
    """
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:16]]


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas.

    Payloads are large — the iterator form processes one Arrow batch at
    a time so executor memory stays bounded; repartition upstream by
    ``media_id`` if payload skew is observed.
    """

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            feats = []
            ok = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(_decode_stub(bytes(payload), kind))
                    ok.append(True)
                except Exception:
                    feats.append([0.0] * 16)
                    ok.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats, "decode_ok": ok})

    return media.mapInPandas(_gen, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing (stub kernel): passes payload through and
    rewrites metadata; real kernel = PIL resize inside the same UDF
    shape."""

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(_gen, MEDIA_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled timestamp.
    The frame payload is stubbed as the sliced source hash."""
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
