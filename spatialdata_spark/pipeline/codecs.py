"""Pure-stdlib image codecs for the multimodal pipeline.

The container has no PIL/ffmpeg, but PNG is just zlib (stdlib) plus
per-scanline prediction filters, so the image kernels can be *real*
instead of stubbed: :func:`png_decode` implements the full PNG
unfiltering spec (None/Sub/Up/Average/Paeth) for 8-bit gray / RGB /
RGBA non-interlaced images, and :func:`png_encode` writes a spec-valid
(filter-0) PNG any external decoder can read.  :func:`bilinear_resize`
is the standard center-aligned bilinear resampler in numpy.

These run *inside* Arrow-batched UDFs — the Spark-side plumbing in
``multimodal.py`` treats them as the pluggable kernel slot that a real
deployment would fill with PIL/libvips; the contract (bytes in, HWC
uint8 array out) is identical.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", crc32(kind + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a PNG (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced gray/gray+alpha/RGB/RGBA PNG to an
    (H, W, C) uint8 array.  Raises ValueError on non-PNG input or
    unsupported variants (palette, 16-bit, interlaced)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color_type]
        elif kind == b"IDAT":
            idat += body
        elif kind == b"IEND":
            break
    if w is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1).astype(
            np.int32
        )
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x, vectorized over channels
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, channels)


def bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Center-aligned bilinear resample of an (H, W, C) array; returns
    float64 (caller quantizes).  Linear intensity fields are reproduced
    exactly, which is what makes closed-form oracles possible."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, _ = a.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    v00 = a[y0][:, x0]
    v01 = a[y0][:, x1]
    v10 = a[y1][:, x0]
    v11 = a[y1][:, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio analog of the PNG codec above: a real,
# fully-parsed container format implemented on the stdlib only.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM16, mono or (n, 2) stereo."""
    import struct

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    pcm = np.clip(np.round(a), -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE container: PCM16 only; returns
    ``(sample_rate, samples)`` with samples shaped (n, channels).
    Walks the chunk list (extra chunks like LIST are skipped), so
    real-world files with metadata chunks parse too."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    a = np.frombuffer(data, dtype="<i2")
    return int(sample_rate), a.reshape(-1, n_ch)


# ---------------------------------------------------------------------------
# AVI (RIFF) with uncompressed DIB frames — a real, fully-parsed video
# container on the stdlib: the same RIFF chunk walk as WAV, plus the
# BITMAPINFOHEADER frame geometry.  Completes the image(PNG)/audio(WAV)/
# video(AVI) triad of stdlib-only codecs.
# ---------------------------------------------------------------------------


def _riff_chunks(payload: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = __import__("struct").unpack("<I", payload[pos + 4 : pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def encode_avi(frames, fps: int = 10) -> bytes:
    """Minimal RIFF/AVI writer: uncompressed 24-bit DIB ('00db')
    frames; rows bottom-up BGR, 4-byte aligned — the layout every AVI
    reader understands."""
    import struct

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    payloads = []
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):
            row = f[y, :, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        payloads.append(b"".join(rows))
    frame_size = stride * h

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10,
                       len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<10I", 0, 0, 0, 1, fps, 0,
            len(frames), frame_size, 0xFFFFFFFF, 0) + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes):
    """Parse a RIFF/AVI container with uncompressed DIB frames:
    returns ``(fps, [frame (h, w, 3) uint8 RGB, ...])``.  Walks LIST
    hdrl for geometry (BITMAPINFOHEADER in strf) and LIST movi for
    '00db'/'00dc' frame chunks; non-DIB compression raises."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    fps = 0
    frames_raw = []

    def walk(pos, end):
        nonlocal w, h, fps
        for cid, body_at, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)
            elif cid == b"strf" and size >= 40:
                (bi_size, bw, bh, _pl, bits, comp) = struct.unpack("<IiiHHI", payload[body_at : body_at + 20])
                if comp != 0 or bits != 24:
                    raise ValueError(f"unsupported AVI: compression={comp} bits={bits}")
                w, h = int(bw), abs(int(bh))
            elif cid == b"avih" and size >= 4:
                (uspf,) = struct.unpack("<I", payload[body_at : body_at + 4])
                fps = round(1_000_000 / uspf) if uspf else 0
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(payload[body_at : body_at + size])

    walk(12, len(payload))
    if w is None or not frames_raw:
        raise ValueError("missing strf header or frame chunks")
    stride = (w * 3 + 3) & ~3
    frames = []
    for raw in frames_raw:
        a = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)[:, : w * 3]
        a = a.reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
        frames.append(np.ascontiguousarray(a))
    return fps, frames
