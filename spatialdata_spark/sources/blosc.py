"""Pure-Python Blosc v1 chunk codec (decode + minimal encode).

The reference writes zarr rasters blosc-compressed by default
(reference: src/spatialdata/_io/io_raster.py:350-384 —
``BloscCodec(cname="lz4")`` for zarr v3, ``numcodecs.Blosc`` for v2),
so every real scverse-produced store on disk needs this codec to read.
The container has no ``blosc``/``numcodecs`` C libraries; this module
implements the *public Blosc chunk wire format* (c-blosc 1.x, also the
payload format of the zarr v3 blosc codec) in stdlib + numpy:

Chunk layout (little-endian)::

    byte  0      format version
    byte  1      codec format version
    byte  2      flags: 0x1 byte-shuffle, 0x2 memcpyed, 0x4 bit-shuffle,
                 0x10 dont-split; bits 5-7 compressor code
    byte  3      typesize
    bytes 4-8    nbytes   (uncompressed size)
    bytes 8-12   blocksize
    bytes 12-16  cbytes   (total compressed size, incl. this header)
    then, unless memcpyed: uint32 offsets of each block, then blocks.
    A block holds one stream per split (byte-shuffle may split a block
    into ``typesize`` streams), each stream ``[uint32 csize][payload]``;
    a stream stored verbatim has csize == its uncompressed size.

Compressor codes: 0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd.
Supported here: **lz4** (pure-Python LZ4 block codec below), **zlib**
(stdlib), **zstd** (pure-Python RFC 8878 decoder in
``sources/zstd.py``, pinned against pyarrow's real libzstd), **snappy**
(raw-block decoder below, pinned against pyarrow's real snappy) and
the raw/memcpy path.  blosclz raises a clear error: its wire format
changed across c-blosc releases and no reference implementation exists
in this container to verify a reimplementation against.  Byte-shuffle
is reversed with a numpy transpose; bit-shuffle raises for the same
verifiability reason (zarr's default is byte-shuffle).

The stream-split count is not trusted from the flags byte alone: the
decoder walks each block's streams and validates that they consume
exactly the block's byte span (the spans are delimited by the sorted
block offsets), trying ``typesize`` streams first, then 1 — this
decodes chunks from both pre- and post-1.14 c-blosc split policies.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_BLOSCLZ, _LZ4, _SNAPPY, _ZLIB, _ZSTD = 0, 1, 2, 3, 4
_CODEC_NAMES = {_BLOSCLZ: "blosclz", _LZ4: "lz4", _SNAPPY: "snappy", _ZLIB: "zlib", _ZSTD: "zstd"}

FLAG_SHUFFLE = 0x1
FLAG_MEMCPYED = 0x2
FLAG_BITSHUFFLE = 0x4
FLAG_DONT_SPLIT = 0x10


# ---------------------------------------------------------------------------
# LZ4 block format (public spec: lz4_Block_format.md)
# ---------------------------------------------------------------------------


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 *block* (token / literals / offset / match runs)."""
    src = bytes(src)
    n = len(src)
    dst = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            dst += src[i : i + lit]
            i += lit
        if i >= n:
            break  # last sequence carries no match
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = token & 0xF
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(dst) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: match before buffer start")
        if offset >= mlen:
            dst += dst[start : start + mlen]
        else:
            # overlapping match: the copy source grows as we write
            for k in range(mlen):
                dst.append(dst[start + k])
    if len(dst) != dst_size:
        raise ValueError(f"LZ4 block decoded to {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def lz4_compress(src: bytes) -> bytes:
    """Minimal valid LZ4 block: one literal-only sequence.

    Produces spec-conformant output any LZ4 decoder accepts (a block may
    consist of a single final sequence with no match).  No compression is
    attempted — this exists so blosc chunks we *write* are readable by
    real blosc/numcodecs, and to build test fixtures for the decoder.
    """
    n = len(src)
    out = bytearray()
    if n < 15:
        out.append(n << 4)
    else:
        out.append(0xF0)
        rest = n - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += src
    return bytes(out)


# ---------------------------------------------------------------------------
# Snappy raw block format (public spec: snappy format description)
# ---------------------------------------------------------------------------


def snappy_decompress(src: bytes) -> bytes:
    """Decode one raw Snappy block (the format c-blosc's snappy codec
    stores — not the framed variant): a varint uncompressed length, then
    literal / 1-2-4-byte-offset copy elements.  Validated against
    pyarrow's bundled real snappy in tests."""
    src = bytes(src)
    n = len(src)
    # varint preamble
    dst_size = 0
    shift = 0
    i = 0
    while True:
        if i >= n:
            raise ValueError("corrupt snappy block: truncated length varint")
        b = src[i]
        i += 1
        dst_size |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    dst = bytearray()
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nbytes = length - 60
                length = int.from_bytes(src[i : i + nbytes], "little") + 1
                i += nbytes
            dst += src[i : i + length]
            i += length
            continue
        if kind == 1:
            length = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:
            length = (tag >> 2) + 1
            offset = src[i] | (src[i + 1] << 8)
            i += 2
        else:
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[i : i + 4], "little")
            i += 4
        start = len(dst) - offset
        if offset == 0 or start < 0:
            raise ValueError("corrupt snappy block: bad copy offset")
        if offset >= length:
            dst += dst[start : start + length]
        else:  # overlapping copy: source grows as we write
            for k in range(length):
                dst.append(dst[start + k])
    if len(dst) != dst_size:
        raise ValueError(f"snappy block decoded to {len(dst)} bytes, expected {dst_size}")
    return bytes(dst)


def snappy_compress(src: bytes) -> bytes:
    """Minimal valid Snappy block: the length varint + literal elements.

    Spec-conformant output any snappy decoder accepts (pinned against
    pyarrow's real snappy in tests); exists for writing interoperable
    chunks and building decoder fixtures."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break
    pos = 0
    while pos < n:
        length = min(n - pos, 1 << 16)
        if length <= 60:
            out.append((length - 1) << 2)
        else:
            enc = length - 1
            nbytes = (enc.bit_length() + 7) // 8
            out.append((59 + nbytes) << 2)
            out += enc.to_bytes(nbytes, "little")
        out += src[pos : pos + length]
        pos += length
    return bytes(out)


# ---------------------------------------------------------------------------
# byte shuffle
# ---------------------------------------------------------------------------


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    """Reverse blosc byte-shuffle on one block: stored layout is all
    byte-0s, then all byte-1s, ...; a tail shorter than typesize is
    stored verbatim after the shuffled body."""
    if typesize <= 1:
        return buf
    nitems = len(buf) // typesize
    body = nitems * typesize
    a = np.frombuffer(buf[:body], dtype=np.uint8).reshape(typesize, nitems)
    return a.T.tobytes() + buf[body:]


def _shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return buf
    nitems = len(buf) // typesize
    body = nitems * typesize
    a = np.frombuffer(buf[:body], dtype=np.uint8).reshape(nitems, typesize)
    return a.T.tobytes() + buf[body:]


# ---------------------------------------------------------------------------
# blosc chunk decode
# ---------------------------------------------------------------------------


def _decode_stream(codec: int, payload: bytes, raw_size: int) -> bytes:
    if len(payload) == raw_size:
        # stored verbatim (compressor gave up on this stream)
        return payload
    if codec == _LZ4:
        return lz4_decompress(payload, raw_size)
    if codec == _ZLIB:
        out = zlib.decompress(payload)
        if len(out) != raw_size:
            raise ValueError("zlib stream decoded to unexpected size")
        return out
    if codec == _ZSTD:
        from spatialdata_spark.sources.zstd import zstd_decompress

        out = zstd_decompress(payload)
        if len(out) != raw_size:
            raise ValueError("zstd stream decoded to unexpected size")
        return out
    if codec == _SNAPPY:
        out = snappy_decompress(payload)
        if len(out) != raw_size:
            raise ValueError("snappy stream decoded to unexpected size")
        return out
    raise ValueError(
        f"unsupported blosc inner codec {_CODEC_NAMES.get(codec, codec)!r}: "
        "lz4/zlib/zstd/snappy/raw streams decode in this environment; "
        "blosclz does not (its wire format changed across c-blosc releases "
        "and no reference implementation is available here to verify "
        "against — re-encode the store with cname lz4/zstd/zlib)"
    )


def blosc_decompress(chunk: bytes) -> bytes:
    """Decode one blosc v1 chunk to its raw bytes."""
    if len(chunk) < 16:
        raise ValueError("blosc chunk shorter than its 16-byte header")
    flags, typesize = chunk[2], chunk[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", chunk, 4)
    if cbytes != len(chunk):
        # tolerate trailing padding some writers add, but never truncation
        if cbytes > len(chunk):
            raise ValueError(f"blosc chunk truncated: header says {cbytes}, got {len(chunk)}")
    if flags & FLAG_BITSHUFFLE:
        raise ValueError("blosc bit-shuffle filter is not supported (byte-shuffle and plain are)")
    if nbytes == 0:
        return b""
    if flags & FLAG_MEMCPYED:
        return bytes(chunk[16 : 16 + nbytes])
    codec = flags >> 5
    if codec == _BLOSCLZ:
        raise ValueError(
            "unsupported blosc compressor 'blosclz': its wire format changed "
            "across c-blosc releases and no reference implementation exists in "
            "this environment to verify a reimplementation against; "
            "lz4/zlib/zstd/snappy blosc chunks are supported"
        )
    blocksize = blocksize or nbytes
    nblocks = -(-nbytes // blocksize)
    bstarts = list(struct.unpack_from(f"<{nblocks}I", chunk, 16))
    # block spans are delimited by the sorted start offsets
    sorted_starts = sorted(bstarts) + [cbytes]
    span_end = {s: sorted_starts[i + 1] for i, s in enumerate(sorted_starts[:-1])}
    shuffled = bool(flags & FLAG_SHUFFLE) and typesize > 1
    out = bytearray()
    for j in range(nblocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        start, end = bstarts[j], span_end[bstarts[j]]
        candidates = [typesize, 1] if (shuffled and neblock % typesize == 0) else [1]
        block = None
        last_err: Exception | None = None
        for nstreams in candidates:
            if neblock % nstreams:
                continue
            try:
                block = _walk_streams(chunk, start, end, nstreams, neblock, codec)
                break
            except ValueError as e:  # wrong split guess or corrupt: try next
                last_err = e
        if block is None:
            raise ValueError(f"cannot decode blosc block {j}: {last_err}")
        if shuffled:
            block = _unshuffle(block, typesize)
        out += block
    return bytes(out[:nbytes])


def _walk_streams(chunk: bytes, start: int, end: int, nstreams: int, neblock: int, codec: int) -> bytes:
    per = neblock // nstreams
    pos = start
    parts = []
    for _ in range(nstreams):
        if pos + 4 > end:
            raise ValueError("stream prefix past block end")
        (csize,) = struct.unpack_from("<I", chunk, pos)
        pos += 4
        if pos + csize > end:
            raise ValueError("stream payload past block end")
        parts.append(_decode_stream(codec, bytes(chunk[pos : pos + csize]), per))
        pos += csize
    if pos != end:
        raise ValueError(f"streams consumed {pos - start} bytes, block span is {end - start}")
    return b"".join(parts)


# ---------------------------------------------------------------------------
# blosc chunk encode (valid format; trivial lz4 literal streams)
# ---------------------------------------------------------------------------


def blosc_compress(
    buf: bytes,
    typesize: int = 1,
    cname: str = "lz4",
    shuffle: int = 1,
    blocksize: int = 0,
) -> bytes:
    """Encode raw bytes as a spec-conformant blosc v1 chunk.

    ``shuffle``: 0 none, 1 byte-shuffle (numcodecs constants).  lz4 /
    zstd / snappy streams are literal-only (zlib really deflates), so
    output may be bigger than input — the point is *format* interop
    (real blosc reads it back), used for fixtures and for writing
    stores foreign readers expect.
    """
    codecs = {"lz4": _LZ4, "zlib": _ZLIB, "zstd": _ZSTD, "snappy": _SNAPPY}
    if cname not in codecs:
        raise ValueError(f"blosc_compress supports lz4/zlib/zstd/snappy here, not {cname!r}")
    codec = codecs[cname]
    nbytes = len(buf)
    typesize = max(1, int(typesize))
    if shuffle not in (0, 1):
        raise ValueError("shuffle must be 0 (none) or 1 (byte-shuffle)")
    blocksize = int(blocksize) or min(max(nbytes, typesize), 1 << 20)
    if blocksize % typesize:
        blocksize += typesize - blocksize % typesize
    flags = codec << 5
    do_shuffle = shuffle == 1 and typesize > 1
    if do_shuffle:
        flags |= FLAG_SHUFFLE
    nblocks = max(1, -(-nbytes // blocksize))
    # one global split policy (like c-blosc): split shuffled blocks into
    # typesize streams; a leftover block that doesn't divide falls back
    # to a single stream without flipping the policy flag
    split = do_shuffle and typesize <= 16
    if not split:
        flags |= FLAG_DONT_SPLIT
    blocks = []
    for j in range(nblocks):
        neblock = min(blocksize, nbytes - j * blocksize)
        block = buf[j * blocksize : j * blocksize + neblock]
        if do_shuffle:
            block = _shuffle(block, typesize)
        nstreams = typesize if (split and neblock % typesize == 0) else 1
        per = neblock // nstreams
        enc = bytearray()
        for s in range(nstreams):
            stream = block[s * per : (s + 1) * per]
            if codec == _LZ4:
                payload = lz4_compress(stream)
            elif codec == _ZLIB:
                payload = zlib.compress(stream)
            elif codec == _ZSTD:
                from spatialdata_spark.sources.zstd import zstd_compress

                payload = zstd_compress(stream)
            else:
                payload = snappy_compress(stream)
            if len(payload) >= per and per > 0:
                payload = stream  # store verbatim: csize == raw size
            enc += struct.pack("<I", len(payload)) + payload
        blocks.append(bytes(enc))
    header_len = 16 + 4 * nblocks
    bstarts = []
    pos = header_len
    for b in blocks:
        bstarts.append(pos)
        pos += len(b)
    cbytes = pos
    out = bytearray()
    out += bytes([2, 1, flags, min(typesize, 255)])
    out += struct.pack("<III", nbytes, blocksize, cbytes)
    out += struct.pack(f"<{nblocks}I", *bstarts)
    for b in blocks:
        out += b
    return bytes(out)
