"""Pure-Python Zstandard frame decoder (RFC 8878, decompression only).

c-blosc's ``zstd`` inner codec (``numcodecs.Blosc(cname="zstd")``, a
common configuration for zarr stores in the wild — the reference's
default is lz4, see src/spatialdata/_io/io_raster.py:350-384) stores
each stream as a standard Zstandard *frame*.  The container has no
zstd library, so this module implements the public frame format from
the spec: frame header, raw/RLE/compressed blocks, Huffman-coded
literals (direct and FSE-compressed weights), and FSE-coded sequences
with the three repeat offsets.

Everything here is derived from RFC 8878 alone; the test suite
round-trips frames produced by pyarrow's bundled libzstd (real
compressor output at several levels), so the decoder is validated
against the reference implementation, not just itself.

Not implemented (all raise ``ValueError`` with the reason): external
dictionaries (``Dictionary_ID != 0``) and window sizes the decoder
would need streaming eviction for — blosc streams never use either
(each chunk is one self-contained frame).  The 4-byte xxhash64
content checksum is skipped, not verified (no xxhash in stdlib).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F


# ---------------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions, RFC 4.1.1)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # absolute bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p, buf = self.pos, self.buf
        lo, hi = p >> 3, (p + n + 7) >> 3
        if hi > len(buf):
            raise ValueError("zstd: FSE table description overruns its input")
        v = int.from_bytes(buf[lo:hi], "little") >> (p & 7)
        self.pos = p + n
        return v & ((1 << n) - 1)

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackwardBits:
    """MSB-side backward reader for FSE/Huffman bitstreams (RFC 3.1.1.4):
    the final byte carries a 1-sentinel above the payload bits; reads pull
    the ``n`` bits just below the cursor.  Overdraw past the start returns
    the remaining bits zero-padded in the LOW positions (the convention
    the interleaved-FSE termination rule relies on); ``remaining`` goes
    negative to signal it."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        if not buf or buf[-1] == 0:
            raise ValueError("zstd: backward bitstream missing its sentinel bit")
        self.buf = buf
        self.pos = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1

    @property
    def remaining(self) -> int:
        return self.pos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        self.pos = p
        if p < 0:
            got = n + p  # bits actually available
            if got <= 0:
                return 0
            v = int.from_bytes(self.buf[0 : (got + 7) >> 3], "little")
            return (v & ((1 << got) - 1)) << (n - got)
        buf = self.buf
        lo, hi = p >> 3, (p + n + 7) >> 3
        v = int.from_bytes(buf[lo:hi], "little") >> (p & 7)
        return v & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _fse_read_ncount(bits: _ForwardBits, max_symbol: int) -> tuple[list[int], int]:
    """Parse an FSE table description -> (normalized counts, accuracy_log)
    (RFC 8878 §4.1.1, the threshold-coded variable-bit scheme with
    2-bit zero-repeat flags)."""
    accuracy_log = bits.read(4) + 5
    table_size = 1 << accuracy_log
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy_log + 1
    counts: list[int] = []
    previous0 = False
    while remaining > 1 and len(counts) <= max_symbol:
        if previous0:
            # runs of zero-probability symbols: 2-bit repeat flags,
            # value 3 chains to another flag
            while True:
                rep = bits.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
            previous0 = False
            if len(counts) > max_symbol:
                break
            continue
        # threshold-coded value: nb_bits-1 low bits suffice when below
        # maxv, else one more (top) bit completes the full-width value
        # (LSB-first forward stream, so read n-1 then 1 == read n)
        maxv = (2 * threshold - 1) - remaining
        count = bits.read(nb_bits - 1)
        if count >= maxv:
            count |= bits.read(1) << (nb_bits - 1)
            if count >= threshold:
                count -= maxv
        count -= 1  # the coded value is probability + 1 (-1 flags "less than 1")
        remaining -= -count if count < 0 else count
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE table description (counts don't sum)")
    return counts, accuracy_log


class _FseTable:
    """Decoding table: per-state (symbol, nb_bits, base_state)."""

    __slots__ = ("symbols", "nb_bits", "base", "accuracy_log")

    def __init__(self, counts: list[int], accuracy_log: int) -> None:
        size = 1 << accuracy_log
        self.accuracy_log = accuracy_log
        table = [0] * size
        high = size - 1
        for s, c in enumerate(counts):
            if c == -1:  # "less than 1" symbols take the top states
                table[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                table[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("zstd: FSE spread did not close")
        counters = [c if c > 0 else 1 for c in counts]
        self.symbols = table
        self.nb_bits = [0] * size
        self.base = [0] * size
        for state in range(size):
            s = table[state]
            x = counters[s]
            counters[s] = x + 1
            nb = accuracy_log - (x.bit_length() - 1)
            self.nb_bits[state] = nb
            self.base[state] = (x << nb) - size

    @classmethod
    def rle(cls, symbol: int) -> "_FseTable":
        t = cls.__new__(cls)
        t.accuracy_log = 0
        t.symbols = [symbol]
        t.nb_bits = [0]
        t.base = [0]
        return t


def _fse_decompress_interleaved(table: _FseTable, bits: _BackwardBits, max_out: int) -> list[int]:
    """Two alternating FSE states over one backward stream (the Huffman
    weight encoding, RFC 4.2.1.2); stops when the stream is exhausted."""
    out: list[int] = []
    s1 = bits.read(table.accuracy_log)
    s2 = bits.read(table.accuracy_log)
    while len(out) < max_out:
        out.append(table.symbols[s1])
        s1 = table.base[s1] + bits.read(table.nb_bits[s1])
        if bits.remaining < 0:
            out.append(table.symbols[s2])
            break
        if len(out) >= max_out:
            break
        out.append(table.symbols[s2])
        s2 = table.base[s2] + bits.read(table.nb_bits[s2])
        if bits.remaining < 0:
            out.append(table.symbols[s1])
            break
    return out


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HufTable:
    """Prefix-peek table over max_bits: entry -> (symbol, code length)."""

    __slots__ = ("symbols", "lengths", "max_bits")

    def __init__(self, weights: list[int]) -> None:
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty Huffman weights")
        # the last symbol's weight is implied: it completes the smallest
        # power of two STRICTLY greater than the explicit weights' sum
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left <= 0 or left & (left - 1):
            raise ValueError("zstd: Huffman weights don't leave a power-of-two remainder")
        weights = weights + [left.bit_length()]
        if max_bits > 11:
            raise ValueError("zstd: Huffman code exceeds the 11-bit spec limit")
        size = 1 << max_bits
        self.max_bits = max_bits
        self.symbols = bytearray(size)
        self.lengths = bytearray(size)
        # canonical fill: lowest weight = longest codes first from index 0;
        # within a weight, natural symbol order; each symbol spans
        # 2^(weight-1) table entries
        pos = 0
        for w in range(1, max_bits + 1):
            span = 1 << (w - 1)
            nb = max_bits + 1 - w
            for sym, ws in enumerate(weights):
                if ws != w:
                    continue
                for i in range(span):
                    self.symbols[pos + i] = sym
                    self.lengths[pos + i] = nb
                pos += span
        if pos != size:
            raise ValueError("zstd: Huffman table fill mismatch")

    def decode_stream(self, bits: _BackwardBits, n_out: int) -> bytes:
        """Decode ``n_out`` literals from one backward stream.  The
        per-symbol loop is the decoder's hot path (literal-heavy data is
        one symbol per output byte), so the bit reads are inlined over a
        sliding 16-byte window instead of going through
        ``_BackwardBits.read`` — same semantics incl. zero-padded
        overdraw, ~10x fewer Python ops per symbol."""
        out = bytearray(n_out)
        mask = (1 << self.max_bits) - 1
        symbols, lengths = self.symbols, self.lengths
        buf = bits.buf
        pos = bits.pos - self.max_bits
        # window covers bits [base, base + 128); refill keeps pos-11 >= base
        base = max(0, (pos >> 3) - 8) << 3
        win = int.from_bytes(buf[base >> 3 : (base >> 3) + 16], "little")
        if pos >= 0:
            state = (win >> (pos - base)) & mask
        else:
            state = bits.read(self.max_bits)  # degenerate tiny stream
            pos = bits.pos
        for i in range(n_out):
            out[i] = symbols[state]
            nb = lengths[state]
            pos -= nb
            if pos < base:
                if pos < 0:
                    # overdraw: the generic reader zero-pads below (the
                    # padding property keeps the final symbols correct)
                    bits.pos = pos + nb
                    state = ((state << nb) | bits.read(nb)) & mask
                    pos = bits.pos
                    base = 0
                    win = int.from_bytes(buf[0:16], "little")
                    continue
                base = max(0, (pos >> 3) - 8) << 3
                win = int.from_bytes(buf[base >> 3 : (base >> 3) + 16], "little")
            state = ((state << nb) | ((win >> (pos - base)) & ((1 << nb) - 1))) & mask
        bits.pos = pos
        return bytes(out)


def _read_huffman_table(data: bytes) -> tuple[_HufTable, int]:
    """Parse a Huffman tree description; returns (table, bytes consumed)."""
    header = data[0]
    if header >= 128:
        n = header - 127
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HufTable(weights), 1 + (n + 1) // 2
    # FSE-compressed weights: header = compressed size
    comp = bytes(data[1 : 1 + header])
    fwd = _ForwardBits(comp)
    counts, acc = _fse_read_ncount(fwd, 255)
    if acc > 6:
        raise ValueError("zstd: Huffman-weight FSE accuracy above the spec limit of 6")
    table = _FseTable(counts, acc)
    stream = comp[fwd.bytes_consumed() :]
    weights = _fse_decompress_interleaved(table, _BackwardBits(stream), 254)
    return _HufTable(weights), 1 + header


# ---------------------------------------------------------------------------
# sequences: default distributions and code tables (RFC 8878 §3.1.1.3.2)
# ---------------------------------------------------------------------------

_LL_DEFAULTS = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
                2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULTS = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULTS = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131,
                                 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}
_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}
_DEFAULT_ACC = {"ll": 6, "of": 5, "ml": 6}
_DEFAULTS = {"ll": _LL_DEFAULTS, "of": _OF_DEFAULTS, "ml": _ML_DEFAULTS}


def _sequence_table(kind: str, mode: int, data: bytes, pos: int, prev: _FseTable | None) -> tuple[_FseTable, int]:
    if mode == 0:  # predefined
        return _FseTable(_DEFAULTS[kind], _DEFAULT_ACC[kind]), pos
    if mode == 1:  # RLE: one byte symbol
        sym = data[pos]
        if sym > _MAX_SYMBOL[kind]:
            raise ValueError(f"zstd: RLE {kind} symbol out of range")
        return _FseTable.rle(sym), pos + 1
    if mode == 2:  # FSE-compressed description
        fwd = _ForwardBits(bytes(data[pos:]))
        counts, acc = _fse_read_ncount(fwd, _MAX_SYMBOL[kind])
        if acc > _MAX_ACC[kind]:
            raise ValueError(f"zstd: {kind} accuracy_log {acc} above spec limit")
        return _FseTable(counts, acc), pos + fwd.bytes_consumed()
    if prev is None:  # repeat without a previous table
        raise ValueError(f"zstd: {kind} Repeat_Mode with no previous table")
    return prev, pos


# ---------------------------------------------------------------------------
# block decode
# ---------------------------------------------------------------------------


class _FrameState:
    """Per-frame persistent decoder state (RFC: tables and repeat
    offsets survive across blocks within one frame)."""

    def __init__(self, frame_start: int = 0) -> None:
        self.huffman: _HufTable | None = None
        self.ll: _FseTable | None = None
        self.of: _FseTable | None = None
        self.ml: _FseTable | None = None
        self.reps = [1, 4, 8]
        # RFC 8878 window semantics: matches may never reach back past
        # the start of the current frame, even when earlier frames'
        # output shares the buffer (concatenated-frame input).
        self.frame_start = frame_start


def _decode_literals(block: bytes, pos: int, st: _FrameState) -> tuple[bytes, int]:
    b0 = block[pos]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            return bytes(block[pos : pos + regen]), pos + regen
        return bytes([block[pos]]) * regen, pos + 1
    # Compressed (2) / Treeless (3)
    if size_format == 0:
        n_streams = 1
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_format == 1:
        n_streams = 4
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_format == 2:
        n_streams = 4
        regen = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 3) << 12)
        comp = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
        pos += 4
    else:
        n_streams = 4
        regen = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 0x3F) << 12)
        comp = (block[pos + 2] >> 6) | (block[pos + 3] << 2) | (block[pos + 4] << 10)
        pos += 5
    section = bytes(block[pos : pos + comp])
    pos += comp
    off = 0
    if ltype == 2:
        st.huffman, off = _read_huffman_table(section)
    elif st.huffman is None:
        raise ValueError("zstd: treeless literals with no previous Huffman table")
    huf = st.huffman
    body = section[off:]
    if n_streams == 1:
        return huf.decode_stream(_BackwardBits(body), regen), pos
    if len(body) < 6:
        raise ValueError("zstd: 4-stream literals shorter than the jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
    starts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3, len(body)]
    per = (regen + 3) // 4
    sizes = [per, per, per, regen - 3 * per]
    if sizes[3] < 0:
        raise ValueError("zstd: negative fourth literal stream size")
    out = bytearray()
    for i in range(4):
        stream = body[starts[i] : starts[i + 1]]
        out += huf.decode_stream(_BackwardBits(stream), sizes[i])
    return bytes(out), pos


def _decode_block(block: bytes, out: bytearray, st: _FrameState) -> None:
    literals, pos = _decode_literals(block, 0, st)
    # sequence count
    b0 = block[pos]
    if b0 == 0:
        n_seq = 0
        pos += 1
    elif b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += literals
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved bits set in sequence compression modes")
    st.ll, pos = _sequence_table("ll", (modes >> 6) & 3, block, pos, st.ll)
    st.of, pos = _sequence_table("of", (modes >> 4) & 3, block, pos, st.of)
    st.ml, pos = _sequence_table("ml", (modes >> 2) & 3, block, pos, st.ml)
    bits = _BackwardBits(bytes(block[pos:]))
    ll_t, of_t, ml_t = st.ll, st.of, st.ml
    ll_state = bits.read(ll_t.accuracy_log)
    of_state = bits.read(of_t.accuracy_log)
    ml_state = bits.read(ml_t.accuracy_log)
    lit_pos = 0
    reps = st.reps
    for i in range(n_seq):
        of_code = of_t.symbols[of_state]
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_t.symbols[ml_state]
        match_len = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbols[ll_state]
        lit_len = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset resolution (RFC 3.1.1.5): values 1-3 index the
        # history, shifted by one when the literal length is zero
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx < 3:
                offset = reps[idx]
                if idx == 2:
                    reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # LL==0 and offset_value==3: rep1 - 1
                offset = reps[0] - 1
                if offset <= 0:
                    raise ValueError("zstd: repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if i + 1 < n_seq:
            ll_state = ll_t.base[ll_state] + bits.read(ll_t.nb_bits[ll_state])
            ml_state = ml_t.base[ml_state] + bits.read(ml_t.nb_bits[ml_state])
            of_state = of_t.base[of_state] + bits.read(of_t.nb_bits[of_state])
        out += literals[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        start = len(out) - offset
        if start < st.frame_start:
            raise ValueError("zstd: match offset before frame start")
        if offset >= match_len:
            out += out[start : start + match_len]
        else:  # overlapping match: source grows as we copy
            for k in range(match_len):
                out.append(out[start + k])
    if bits.remaining != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += literals[lit_pos:]


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------


def zstd_decompress(data: bytes) -> bytes:
    """Decode a byte string of zstd (and skippable) frames."""
    data = bytes(data)
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 4:
            raise ValueError("zstd: truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            (size,) = struct.unpack_from("<I", data, pos)
            pos += 4 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad frame magic 0x{magic:08x}")
        pos = _decode_frame(data, pos, out)
    return bytes(out)


def _frame_header(n: int, checksum: bool = False) -> bytes:
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    flags = 0x20 | (0x04 if checksum else 0)  # single-segment [+ checksum]
    if n < 256:
        out += bytes([0 << 6 | flags, n])  # 1-byte FCS
    elif n - 256 < 1 << 16:
        out += bytes([1 << 6 | flags]) + struct.pack("<H", n - 256)
    else:
        out += bytes([2 << 6 | flags]) + struct.pack("<I", n)
    return bytes(out)


def zstd_compress_stored(data: bytes) -> bytes:
    """Encode ``data`` as a valid zstd frame of raw/RLE blocks.

    Real (if modest) compression from the spec's RLE block type alone:
    runs of a single repeated byte become 3-byte RLE blocks — which is
    exactly the structure of sparse/fill-valued raster chunks, where
    zero runs dominate.  Everything else is stored raw.  Any real zstd
    reads the output (pinned against pyarrow's libzstd in tests);
    decoder fixtures are built from it too.  Frame: magic,
    single-segment header with exact content size, then <=128 KiB
    blocks (the spec's Block_Maximum_Size)."""
    data = bytes(data)
    n = len(data)
    out = bytearray(_frame_header(n))
    block_max = 128 * 1024
    min_run = 32  # below this an RLE block's 3-byte header isn't worth splitting
    pos = 0
    blocks: list[tuple[int, bytes]] = []  # (type, payload) — type 0 raw, 1 RLE
    while pos < n:
        b = data[pos]
        run = 1
        limit = min(n, pos + block_max)
        while pos + run < limit and data[pos + run] == b:
            run += 1
        if run >= min_run:
            blocks.append((1, bytes([b]) * run))
            pos += run
            continue
        # raw span: extend until the next long run (or the block cap)
        start = pos
        pos += run
        while pos < limit:
            b = data[pos]
            run = 1
            while pos + run < limit and data[pos + run] == b:
                run += 1
            if run >= min_run:
                break
            pos += run
        blocks.append((0, data[start:pos]))
    if not blocks:
        blocks.append((0, b""))
    for i, (btype, payload) in enumerate(blocks):
        last = 1 if i == len(blocks) - 1 else 0
        size = len(payload)
        out += struct.pack("<I", last | (btype << 1) | (size << 3))[:3]
        out += payload[:1] if btype == 1 else payload
    return bytes(out)


# ---------------------------------------------------------------------------
# real compression: greedy LZ + predefined-FSE sequences (RFC 8878)
# ---------------------------------------------------------------------------


class _FseEncTable:
    """FSE compression table from normalized counts — the mirror of
    :class:`_FseTable`, built exactly as the spec's reference encoder
    does: per-symbol (deltaNbBits, deltaFindState) plus the state-value
    table over the same spread."""

    __slots__ = ("table_log", "state_table", "delta_nb", "delta_find")

    def __init__(self, counts: list[int], table_log: int) -> None:
        size = 1 << table_log
        self.table_log = table_log
        dec = _FseTable(counts, table_log)  # reuse the spread
        cumul = [0]
        for c in counts:
            cumul.append(cumul[-1] + (1 if c == -1 else max(c, 0)))
        self.state_table = [0] * size
        next_slot = list(cumul[:-1])
        for u in range(size):
            s = dec.symbols[u]
            self.state_table[next_slot[s]] = size + u
            next_slot[s] += 1
        self.delta_nb = [0] * len(counts)
        self.delta_find = [0] * len(counts)
        total = 0
        for s, c in enumerate(counts):
            if c == 0:
                self.delta_nb[s] = ((table_log + 1) << 16) - size
            elif c in (-1, 1):
                self.delta_nb[s] = (table_log << 16) - size
                self.delta_find[s] = total - 1
                total += 1
            else:
                # highbit(c-1), not bit_length: maxBitsOut = tableLog - floor(log2(c-1))
                max_bits = table_log - ((c - 1).bit_length() - 1)
                self.delta_nb[s] = (max_bits << 16) - (c << max_bits)
                self.delta_find[s] = total - c
                total += c

    def init_state(self, symbol: int) -> int:
        nb = (self.delta_nb[symbol] + (1 << 15)) >> 16
        v = (nb << 16) - self.delta_nb[symbol]
        return self.state_table[(v >> nb) + self.delta_find[symbol]]

    def encode(self, state: int, symbol: int, sink: "_BitWriter") -> int:
        nb = (state + self.delta_nb[symbol]) >> 16
        sink.add(state, nb)
        return self.state_table[(state >> nb) + self.delta_find[symbol]]

    def flush(self, state: int, sink: "_BitWriter") -> None:
        sink.add(state, self.table_log)


class _BitWriter:
    """LSB-first forward bit writer; ``close`` appends the sentinel bit
    the backward readers expect."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def add(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def close(self) -> bytes:
        self.add(1, 1)  # sentinel
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _package_merge(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (Larmore–Hirschberg
    package-merge, the textbook algorithm).  Returns symbol -> code
    length (<= max_len); the resulting code is complete (Kraft equality),
    which the zstd implied-last-weight scheme requires."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 1:
        return {syms[0]: 1}
    singles = sorted((freqs[s], 1, (s,)) for s in syms)
    level = singles
    for _ in range(max_len - 1):
        packaged = [
            (
                level[i][0] + level[i + 1][0],
                0,
                level[i][2] + level[i + 1][2],
            )
            for i in range(0, (len(level) // 2) * 2 - 1, 2)
        ]
        level = sorted(singles + packaged)
    lengths = {s: 0 for s in syms}
    for _, _, members in level[: 2 * n - 2]:
        for s in members:
            lengths[s] += 1
    return lengths


def _fse_write_ncount(counts: list[int], acc: int) -> bytes:
    """Serialize normalized counts as an FSE table description — the
    exact bit-for-bit mirror of :func:`_fse_read_ncount` (threshold
    coding + 2-bit zero-repeat flags), validated by round-trip."""
    w = _BitWriter()
    w.add(acc - 5, 4)
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nb_bits = acc + 1
    i = 0
    while remaining > 1 and i < len(counts):
        c = counts[i]
        i += 1
        maxv = (2 * threshold - 1) - remaining
        v = c + 1
        if v >= threshold:
            v += maxv
        if v < maxv:
            w.add(v, nb_bits - 1)
        else:
            w.add(v, nb_bits)
        remaining -= -c if c < 0 else c
        while remaining > 1 and remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
        if c == 0 and remaining > 1:
            # the reader expects 2-bit repeat flags after every zero
            run = 0
            while i < len(counts) and counts[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                w.add(3, 2)
                run -= 3
            w.add(run, 2)
    # pad to a byte boundary with zeros (no sentinel: forward stream)
    out = bytearray(w.out)
    if w.nbits:
        out.append(w.acc & 0xFF)
    return bytes(out)


def _normalize_counts(hist: dict[int, int], acc: int, max_symbol: int) -> list[int]:
    """Largest-remainder normalization of a histogram to sum 2**acc
    with every present symbol >= 1."""
    size = 1 << acc
    total = sum(hist.values())
    counts = [0] * (max_symbol + 1)
    for s, h in hist.items():
        counts[s] = max(1, (h * size) // total)
    diff = size - sum(counts)
    order = sorted(hist, key=lambda s: -hist[s])
    j = 0
    while diff != 0:
        s = order[j % len(order)]
        if diff > 0:
            counts[s] += 1
            diff -= 1
        elif counts[s] > 1:
            counts[s] -= 1
            diff += 1
        j += 1
    return counts


def _fse_compress_weights(weights: list[int]) -> bytes | None:
    """FSE-compress a Huffman weight list (the reference encoder's
    two-interleaved-state structure); returns the full description
    (table description + backward stream) or None when it doesn't pay."""
    n = len(weights)
    if n < 2:
        return None
    hist: dict[int, int] = {}
    for x in weights:
        hist[x] = hist.get(x, 0) + 1
    if len(hist) < 2:
        return None
    acc = 6  # weights cap; the description format's floor is 5
    counts = _normalize_counts(hist, acc, max(hist))
    desc = _fse_write_ncount(counts, acc)
    enc = _FseEncTable(counts, acc)
    w = _BitWriter()
    i = n
    if n & 1:
        s1 = enc.init_state(weights[i - 1])
        s2 = enc.init_state(weights[i - 2])
        s1 = enc.encode(s1, weights[i - 3], w)
        i -= 3
    else:
        s2 = enc.init_state(weights[i - 1])
        s1 = enc.init_state(weights[i - 2])
        i -= 2
    while i > 0:
        s2 = enc.encode(s2, weights[i - 1], w)
        s1 = enc.encode(s1, weights[i - 2], w)
        i -= 2
    enc.flush(s2, w)
    enc.flush(s1, w)
    out = desc + w.close()
    return out if len(out) < 128 else None


def _huffman_encode_literals(lits: bytes) -> bytes | None:
    """Huffman-compressed literals section body: direct-weight tree
    description + 1 or 4 backward streams.  None when it doesn't pay or
    when the alphabet needs symbols >= 128 (the direct weight header
    covers at most 128 symbols; binary-ish literals fall back to raw)."""
    n = len(lits)
    if n < 64:
        return None
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2 or n >= (1 << 18):
        return None
    lengths = _package_merge(freqs, 11)
    max_bits = max(lengths.values())
    if ((1 << max_bits) != sum(1 << (max_bits - l) for l in lengths.values())):
        return None  # not a complete code (can't happen, but stay safe)
    weights = {s: max_bits + 1 - l for s, l in lengths.items()}
    max_sym = max(weights)
    # tree description: weights for symbols 0..max_sym-1; the LAST
    # present symbol's weight is implied by the power-of-two remainder.
    # Direct 4-bit packing covers up to 128 listed weights; the
    # FSE-compressed form covers the full byte alphabet — use whichever
    # is valid and smaller.
    n_weights = max_sym  # weights listed for 0..max_sym-1
    wlist = [weights.get(s, 0) for s in range(max_sym)]
    desc = None
    if n_weights <= 128:
        packed = bytearray()
        for i in range(0, n_weights, 2):
            hi = wlist[i] << 4
            lo = wlist[i + 1] if i + 1 < n_weights else 0
            packed.append(hi | lo)
        desc = bytes([127 + n_weights]) + bytes(packed)
    fse_desc = _fse_compress_weights(wlist)
    if fse_desc is not None and (desc is None or len(fse_desc) + 1 < len(desc)):
        desc = bytes([len(fse_desc)]) + fse_desc
    if desc is None:
        return None
    # canonical codes exactly as the decoder fills its table: ascending
    # weight (longest codes first) from table index 0, symbols in
    # natural order within a weight; code = span start >> (max-nb)
    codes: dict[int, tuple[int, int]] = {}
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for s in sorted(weights):
            if weights[s] != w:
                continue
            codes[s] = (pos >> (max_bits - nb), nb)
            pos += span
    def enc_stream(chunk: bytes) -> bytes:
        w = _BitWriter()
        for b in reversed(chunk):
            c, nb = codes[b]
            w.add(c, nb)
        return w.close()

    if n <= 1023:
        stream = enc_stream(lits)
        body = desc + stream
        comp = len(body)
        if comp > 1023:
            return None
        # size_format 0: 1 stream, 10+10 bit sizes over 3 header bytes
        h = [2 | (0 << 2) | ((n & 0xF) << 4), (n >> 4) | ((comp & 3) << 6), comp >> 2]
        out = bytes(h) + body
        return out if len(out) < n else None
    per = (n + 3) // 4
    parts = [lits[0:per], lits[per : 2 * per], lits[2 * per : 3 * per], lits[3 * per :]]
    streams = [enc_stream(p) for p in parts]
    if any(len(s) > 0xFFFF for s in streams[:3]):
        return None
    jump = struct.pack("<HHH", len(streams[0]), len(streams[1]), len(streams[2]))
    body = desc + jump + b"".join(streams)
    comp = len(body)
    if n < (1 << 14) and comp < (1 << 14):
        # size_format 2: 14-bit sizes over 4 bytes
        h = [
            2 | (2 << 2) | ((n & 0xF) << 4),
            (n >> 4) & 0xFF,
            ((n >> 12) & 3) | ((comp & 0x3F) << 2),
            comp >> 6,
        ]
    elif n < (1 << 18) and comp < (1 << 18):
        # size_format 3: 18-bit sizes over 5 bytes
        h = [
            2 | (3 << 2) | ((n & 0xF) << 4),
            (n >> 4) & 0xFF,
            ((n >> 12) & 0x3F) | ((comp & 3) << 6),
            (comp >> 2) & 0xFF,
            comp >> 10,
        ]
    else:
        return None
    out = bytes(h) + body
    return out if len(out) < n else None


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    import bisect

    return bisect.bisect_right(_LL_BASE, v) - 1


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    import bisect

    return bisect.bisect_right(_ML_BASE, v) - 1


_LL_ENC = None
_ML_ENC = None
_OF_ENC = None


def _enc_tables():
    global _LL_ENC, _ML_ENC, _OF_ENC
    if _LL_ENC is None:
        _LL_ENC = _FseEncTable(_LL_DEFAULTS, 6)
        _ML_ENC = _FseEncTable(_ML_DEFAULTS, 6)
        _OF_ENC = _FseEncTable(_OF_DEFAULTS, 5)
    return _LL_ENC, _ML_ENC, _OF_ENC


def _find_sequences(block: bytes) -> list[tuple[int, int, int]] | None:
    """Greedy single-probe hash matcher (block-local offsets; the
    window trivially covers them).  Returns (lit_len, offset,
    match_len) triples, or None when no worthwhile matches exist.
    Keys are the raw 4-byte values — deterministic output across
    processes (python's ``hash`` is salted)."""
    data = block
    n = len(data)
    table: dict[int, int] = {}
    seqs: list[tuple[int, int, int]] = []
    lit_start = 0
    pos = 0
    MIN_MATCH = 4
    MAX_ML = 65538  # ML code 52 ceiling
    while pos + MIN_MATCH <= n:
        key = int.from_bytes(data[pos : pos + MIN_MATCH], "little")
        cand = table.get(key)
        table[key] = pos
        if cand is None:
            pos += 1
            continue
        offset = pos - cand
        ml = MIN_MATCH
        while pos + ml < n and ml < MAX_ML and data[cand + ml] == data[pos + ml]:
            ml += 1
        lit_len = pos - lit_start
        if lit_len > 65535:  # LL code ceiling; extremely literal-heavy -> bail
            return None
        seqs.append((lit_len, offset, ml))
        pos += ml
        lit_start = pos
    if not seqs:
        return None
    return seqs


def _literals_section(lits: bytes) -> bytes:
    n = len(lits)
    if n < 32:
        # 1-byte raw header (5-bit size)
        return bytes([(n << 3) | 0]) + lits
    if n < (1 << 12):
        b0 = ((n & 0xF) << 4) | (1 << 2) | 0
        return bytes([b0, n >> 4]) + lits
    b0 = ((n & 0xF) << 4) | (3 << 2) | 0
    return bytes([b0, (n >> 4) & 0xFF, n >> 12]) + lits


def _encode_block(block: bytes) -> bytes | None:
    """One compressed block: raw literals + predefined-FSE sequences.
    None when compression doesn't pay."""
    seqs = _find_sequences(block)
    if seqs is None:
        return None
    consumed = sum(ll + ml for ll, _, ml in seqs)
    lits = bytearray()
    pos = 0
    for ll, _, ml in seqs:
        lits += block[pos : pos + ll]
        pos += ll + ml
    lits += block[consumed:]
    ll_t, ml_t, of_t = _enc_tables()
    codes = []
    for ll, offset, ml in seqs:
        off_base = offset + 3  # no repeat offsets used
        oc = off_base.bit_length() - 1
        codes.append(
            (
                _ll_code(ll), ll - _LL_BASE[_ll_code(ll)], _LL_BITS[_ll_code(ll)],
                _ml_code(ml), ml - _ML_BASE[_ml_code(ml)], _ML_BITS[_ml_code(ml)],
                oc, off_base - (1 << oc), oc,
            )
        )
    w = _BitWriter()
    lc, lx, lb, mc, mx, mb, oc, ox, ob = codes[-1]
    ml_state = ml_t.init_state(mc)
    of_state = of_t.init_state(oc)
    ll_state = ll_t.init_state(lc)
    w.add(lx, lb)
    w.add(mx, mb)
    w.add(ox, ob)
    for lc, lx, lb, mc, mx, mb, oc, ox, ob in reversed(codes[:-1]):
        of_state = of_t.encode(of_state, oc, w)
        ml_state = ml_t.encode(ml_state, mc, w)
        ll_state = ll_t.encode(ll_state, lc, w)
        w.add(lx, lb)
        w.add(mx, mb)
        w.add(ox, ob)
    ml_t.flush(ml_state, w)
    of_t.flush(of_state, w)
    ll_t.flush(ll_state, w)
    stream = w.close()
    n_seq = len(seqs)
    if n_seq < 128:
        seq_head = bytes([n_seq])
    elif n_seq < 0x7F00:
        seq_head = bytes([(n_seq >> 8) + 128, n_seq & 0xFF])
    else:
        seq_head = bytes([255, (n_seq - 0x7F00) & 0xFF, (n_seq - 0x7F00) >> 8])
    lit_bytes = bytes(lits)
    lit_sec = _huffman_encode_literals(lit_bytes) or _literals_section(lit_bytes)
    body = lit_sec + seq_head + bytes([0x00]) + stream
    if len(body) >= len(block):
        return None
    return body


def zstd_compress(data: bytes, checksum: bool = False) -> bytes:
    """Real zstd compression (stdlib only): greedy hash-match LZ into
    raw-literal + predefined-FSE-sequence compressed blocks, RLE blocks
    for long single-byte runs, raw blocks when neither pays.  Every
    structure is from RFC 8878; output round-trips through this
    module's decoder AND real libzstd (pinned in tests).

    ``checksum=True`` appends the RFC's Content_Checksum (low 32 bits
    of XXH64(content, 0)); the decoder verifies it."""
    data = bytes(data)
    n = len(data)
    out = bytearray(_frame_header(n, checksum))
    block_max = 128 * 1024
    pos = 0
    while True:
        size = min(block_max, n - pos)
        block = data[pos : pos + size]
        last = 1 if pos + size >= n else 0
        if size and len(set(block)) == 1:
            out += struct.pack("<I", last | (1 << 1) | (size << 3))[:3]
            out += block[:1]
        else:
            enc = _encode_block(block) if size else None
            if enc is None and size:
                # no LZ matches paid off: entropy-only block (Huffman
                # literals, zero sequences)
                hl = _huffman_encode_literals(block)
                if hl is not None and len(hl) + 1 < size:
                    enc = hl + bytes([0x00])  # nbSeq = 0
            if enc is not None:
                out += struct.pack("<I", last | (2 << 1) | (len(enc) << 3))[:3]
                out += enc
            else:
                out += struct.pack("<I", last | (0 << 1) | (size << 3))[:3]
                out += block
        pos += size
        if last:
            break
    if checksum:
        from .xxhash import xxh64

        out += struct.pack("<I", xxh64(data, 0) & 0xFFFFFFFF)
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray) -> int:
    desc = data[pos]
    pos += 1
    fcs_flag = desc >> 6
    single_segment = (desc >> 5) & 1
    checksum_flag = (desc >> 2) & 1
    dict_flag = desc & 3
    if desc & 0x8:
        raise ValueError("zstd: reserved frame-descriptor bit set")
    if not single_segment:
        pos += 1  # window descriptor: whole frame is kept in memory anyway
    if dict_flag:
        did_size = (0, 1, 2, 4)[dict_flag]
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            raise ValueError("zstd: external dictionaries are not supported")
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_size:
        content_size = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        pos += fcs_size
    frame_start = len(out)
    st = _FrameState(frame_start)
    while True:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = header & 1
        btype = (header >> 1) & 3
        bsize = header >> 3
        if btype == 0:  # raw
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            out += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            _decode_block(memoryview(data)[pos : pos + bsize], out, st)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if checksum_flag:
        from .xxhash import xxh64

        (stored,) = struct.unpack_from("<I", data, pos)
        pos += 4
        got = xxh64(bytes(out[frame_start:]), 0) & 0xFFFFFFFF
        if got != stored:
            raise ValueError(
                f"zstd: content checksum mismatch "
                f"(stored 0x{stored:08x}, computed 0x{got:08x})"
            )
    if content_size is not None and len(out) - frame_start != content_size:
        raise ValueError(
            f"zstd: frame decoded to {len(out) - frame_start} bytes, "
            f"header declared {content_size}"
        )
    return pos
