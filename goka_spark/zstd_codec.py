"""Pure-Python zstd DECODER for Kafka RecordBatch compression.

Kafka's zstd codec (sarama ``CompressionZSTD``,
config.Producer.Compression) stores standard zstd frames (RFC 8878)
in the records section — no extra framing.  This module implements a
complete single-threaded decoder from the public specification:
frame parsing, raw/RLE/compressed blocks, Huffman-coded literals
(direct and FSE-compressed weight descriptions, 1- and 4-stream),
the three interleaved FSE sequence codes (predefined / RLE /
FSE-described / repeat modes), repeat-offset history, and the
optional XXH64 content checksum.

Decode is complete; produce-side ``compress`` emits spec-valid
*store-mode* frames (raw blocks, no entropy coding — any conforming
decoder accepts them but they compress nothing).  Full entropy
ENCODE would need sequence *search*, which the spec deliberately
does not pin down, so a zstd-configured pipeline is wire-compatible
but pays full bytes on produce.

Tested against a REAL encoder (the zstd bundled in pyarrow's Arrow
C++ build) across sizes, levels, and data shapes, plus format-edge
unit vectors (RLE blocks, treeless literals, repeat offsets,
4-stream Huffman) — see tests/test_zstd_codec.py.
"""

from __future__ import annotations

__all__ = ["compress", "decompress", "xxh64", "ZSTD_MAGIC",
           "ZstdError"]

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_MASK64 = (1 << 64) - 1


class ZstdError(ValueError):
    """Corrupt or unsupported zstd input."""


# -------------------------------------------------------------- XXH64

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _MASK64, 31) * _P64_1) \
        & _MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 from the public xxHash specification — zstd's
    content-checksum primitive (the frame stores its low 32 bits)."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P64_1 + _P64_2) & _MASK64
        a2 = (seed + _P64_2) & _MASK64
        a3 = seed & _MASK64
        a4 = (seed - _P64_1) & _MASK64
        while pos + 32 <= n:
            a1 = _xxh64_round(a1, int.from_bytes(data[pos:pos + 8],
                                                 "little"))
            a2 = _xxh64_round(a2, int.from_bytes(data[pos + 8:pos + 16],
                                                 "little"))
            a3 = _xxh64_round(a3, int.from_bytes(data[pos + 16:pos + 24],
                                                 "little"))
            a4 = _xxh64_round(a4, int.from_bytes(data[pos + 24:pos + 32],
                                                 "little"))
            pos += 32
        acc = (_rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12)
               + _rotl64(a4, 18)) & _MASK64
        for a in (a1, a2, a3, a4):
            acc = ((acc ^ _xxh64_round(0, a)) * _P64_1 + _P64_4) \
                & _MASK64
    else:
        acc = (seed + _P64_5) & _MASK64
    acc = (acc + n) & _MASK64
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos:pos + 8], "little")
        acc = (_rotl64(acc ^ _xxh64_round(0, lane), 27) * _P64_1
               + _P64_4) & _MASK64
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos:pos + 4], "little")
        acc = (_rotl64(acc ^ (lane * _P64_1 & _MASK64), 23) * _P64_2
               + _P64_3) & _MASK64
        pos += 4
    while pos < n:
        acc = (_rotl64(acc ^ (data[pos] * _P64_5 & _MASK64), 11)
               * _P64_1) & _MASK64
        pos += 1
    acc ^= acc >> 33
    acc = acc * _P64_2 & _MASK64
    acc ^= acc >> 29
    acc = acc * _P64_3 & _MASK64
    acc ^= acc >> 32
    return acc


# ------------------------------------------------- bitstream helpers

def _highbit(x: int) -> int:
    return x.bit_length() - 1


class _BackStream:
    """zstd's backward bitstream: bits are consumed from the top of a
    little-endian bit image, after skipping the 1-marked padding bit
    of the final byte.  Reads past the start return zero bits in the
    LOW positions (the FSE interleave loop detects exhaustion via the
    negative remaining count, exactly like the reference decoder)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("backward bitstream: missing padding marker")
        self.val = int.from_bytes(data, "little")
        self.pos = (len(data) - 1) * 8 + _highbit(data[-1])

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        p = self.pos
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        got = n + p  # bits actually available (may be <= 0)
        if got <= 0:
            return 0
        return ((self.val & ((1 << got) - 1)) << (-p)) & ((1 << n) - 1)

    @property
    def remaining(self) -> int:
        return self.pos


class _FwdStream:
    """Forward little-endian bitstream (FSE table descriptions)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ZstdError("FSE table description truncated")
            bit = (self.data[byte] >> (self.bitpos & 7)) & 1
            out |= bit << i
            self.bitpos += 1
        return out

    def rewind(self, n: int) -> None:
        self.bitpos -= n

    def bytes_used(self) -> int:
        return (self.bitpos + 7) >> 3


# ------------------------------------------------------ FSE machinery

class _FSETable:
    """Decode table: per state, (symbol, num_bits, baseline)."""

    __slots__ = ("symbols", "num_bits", "baseline", "accuracy_log")

    def __init__(self, freqs: list[int], accuracy_log: int):
        size = 1 << accuracy_log
        self.accuracy_log = accuracy_log
        self.symbols = [0] * size
        self.num_bits = [0] * size
        self.baseline = [0] * size
        state_desc = [0] * len(freqs)
        high_threshold = size
        for s, f in enumerate(freqs):
            if f == -1:
                high_threshold -= 1
                self.symbols[high_threshold] = s
                state_desc[s] = 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, f in enumerate(freqs):
            if f <= 0:
                continue
            state_desc[s] = f
            for _ in range(f):
                self.symbols[pos] = s
                pos = (pos + step) & mask
                while pos >= high_threshold:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spread did not close")
        for i in range(size):
            s = self.symbols[i]
            nsd = state_desc[s]
            state_desc[s] += 1
            nb = accuracy_log - _highbit(nsd)
            self.num_bits[i] = nb
            self.baseline[i] = (nsd << nb) - size

    @classmethod
    def rle(cls, symbol: int) -> "_FSETable":
        t = cls.__new__(cls)
        t.accuracy_log = 0
        t.symbols = [symbol]
        t.num_bits = [0]
        t.baseline = [0]
        return t


def _fse_read_table(stream: _FwdStream, max_accuracy: int) -> _FSETable:
    """Parse an FSE table description (RFC 8878 §4.1.1)."""
    accuracy_log = stream.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ZstdError(f"FSE accuracy {accuracy_log} > {max_accuracy}")
    remaining = (1 << accuracy_log) + 1
    freqs: list[int] = []
    while remaining > 1 and len(freqs) < 256:
        bits = _highbit(remaining) + 1
        val = stream.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            stream.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        freqs.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            rep = stream.read(2)
            while rep == 3:
                freqs.extend([0, 0, 0])
                rep = stream.read(2)
            freqs.extend([0] * rep)
    if remaining != 1:
        raise ZstdError("FSE frequencies do not sum to table size")
    return _FSETable(freqs, accuracy_log)


def _fse_decode_interleaved(table: _FSETable, data: bytes,
                            max_symbols: int) -> list[int]:
    """Two alternating FSE states over a backward stream — the
    Huffman-weight coding (RFC 8878 §4.2.1.2)."""
    st = _BackStream(data)
    s1 = st.read(table.accuracy_log)
    s2 = st.read(table.accuracy_log)
    out: list[int] = []
    while len(out) < max_symbols:
        out.append(table.symbols[s1])
        s1 = table.baseline[s1] + st.read(table.num_bits[s1])
        if st.remaining < 0:
            out.append(table.symbols[s2])
            break
        out.append(table.symbols[s2])
        s2 = table.baseline[s2] + st.read(table.num_bits[s2])
        if st.remaining < 0:
            out.append(table.symbols[s1])
            break
    return out


# --------------------------------------------------- Huffman literals

class _HufTable:
    __slots__ = ("max_bits", "symbols", "lengths")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("huffman: empty weight set")
        max_bits = _highbit(total) + 1
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ZstdError("huffman: weights do not complete a power of 2")
        weights = weights + [_highbit(left) + 1]
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbols = [0] * size
        self.lengths = [0] * size
        # canonical fill: lowest weights (longest codes) first, natural
        # symbol order inside a weight class
        pos = 0
        for w in range(1, max_bits + 1):
            for s, ws in enumerate(weights):
                if ws != w:
                    continue
                bits = max_bits + 1 - w
                span = 1 << (max_bits - bits)
                for _ in range(span):
                    self.symbols[pos] = s
                    self.lengths[pos] = bits
                    pos += 1
        if pos != size:
            raise ZstdError("huffman: table fill mismatch")


def _huf_read_table(data: bytes) -> tuple[_HufTable, int]:
    """Parse a Huffman tree description; returns (table, bytes used)."""
    if not data:
        raise ZstdError("huffman: empty tree description")
    hdr = data[0]
    if hdr >= 128:  # direct 4-bit weights
        n = hdr - 127
        nbytes = (n + 1) // 2
        raw = data[1:1 + nbytes]
        if len(raw) < nbytes:
            raise ZstdError("huffman: truncated direct weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HufTable(weights), 1 + nbytes
    comp = data[1:1 + hdr]
    if len(comp) < hdr:
        raise ZstdError("huffman: truncated FSE weights")
    fwd = _FwdStream(comp)
    table = _fse_read_table(fwd, 6)
    weights = _fse_decode_interleaved(table, comp[fwd.bytes_used():], 255)
    return _HufTable(weights), 1 + hdr


def _huf_decode_stream(table: _HufTable, data: bytes, n_out: int) -> bytes:
    """One Huffman-coded literal stream: peek a sliding max_bits
    window from the backward stream, table lookup, consume the code's
    length; a valid stream lands exactly on bit 0 with n_out bytes."""
    st = _BackStream(data)
    out = bytearray()
    mb = table.max_bits
    mask = (1 << mb) - 1
    pos = st.pos
    val = st.val
    while len(out) < n_out:
        if pos <= 0:
            raise ZstdError("huffman: stream exhausted early")
        if pos >= mb:
            idx = (val >> (pos - mb)) & mask
        else:  # final codes: zero-fill below the stream start
            idx = ((val & ((1 << pos) - 1)) << (mb - pos)) & mask
        ln = table.lengths[idx]
        out.append(table.symbols[idx])
        pos -= ln
    if pos != 0:
        raise ZstdError("huffman: stream not fully consumed")
    return bytes(out)


# ----------------------------------------------------- sequence codes

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
               2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
               -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
               -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_TABLE_DEFAULT = _FSETable(_LL_DEFAULT, 6)
_ML_TABLE_DEFAULT = _FSETable(_ML_DEFAULT, 6)
_OF_TABLE_DEFAULT = _FSETable(_OF_DEFAULT, 5)

_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9}


class _FrameCtx:
    """Per-frame mutable decode state: repeat offsets, the previous
    Huffman table (treeless literals), the previous FSE tables
    (Repeat_Mode sequences)."""

    def __init__(self) -> None:
        self.rep = [1, 4, 8]
        self.huf: _HufTable | None = None
        self.fse: dict[str, _FSETable | None] = {
            "ll": None, "of": None, "ml": None}


def _read_seq_table(kind: str, mode: int, data: bytes, pos: int,
                    ctx: _FrameCtx,
                    default: _FSETable) -> tuple[_FSETable, int]:
    if mode == 0:  # predefined
        ctx.fse[kind] = default
        return default, pos
    if mode == 1:  # RLE: one byte symbol
        t = _FSETable.rle(data[pos])
        ctx.fse[kind] = t
        return t, pos + 1
    if mode == 2:  # FSE-described
        fwd = _FwdStream(data[pos:])
        t = _fse_read_table(fwd, _MAX_ACCURACY[kind])
        ctx.fse[kind] = t
        return t, pos + fwd.bytes_used()
    prev = ctx.fse[kind]  # repeat
    if prev is None:
        raise ZstdError(f"sequence {kind}: Repeat_Mode with no prior table")
    return prev, pos


def _decode_literals(block: bytes, pos: int,
                     ctx: _FrameCtx) -> tuple[bytes, int]:
    b0 = block[pos]
    lit_type = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_fmt in (0, 2):
            # Size_Format uses only 1 bit here: values 0b00 and 0b10
            # are both the 1-byte form, size = header >> 3 (5 bits)
            rsize = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            rsize = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            rsize = (b0 >> 4) | (block[pos + 1] << 4) \
                | (block[pos + 2] << 12)
            pos += 3
        if lit_type == 0:
            lits = block[pos:pos + rsize]
            if len(lits) != rsize:
                raise ZstdError("literals: truncated raw section")
            return lits, pos + rsize
        return bytes([block[pos]]) * rsize, pos + 1
    # compressed (2) / treeless (3): sizes are 10/14/18-bit pairs
    if size_fmt in (0, 1):
        h = int.from_bytes(block[pos:pos + 3], "little")
        rsize = (h >> 4) & 0x3FF
        csize = (h >> 14) & 0x3FF
        pos += 3
        four = size_fmt == 1
    elif size_fmt == 2:
        h = int.from_bytes(block[pos:pos + 4], "little")
        rsize = (h >> 4) & 0x3FFF
        csize = (h >> 18) & 0x3FFF
        pos += 4
        four = True
    else:
        h = int.from_bytes(block[pos:pos + 5], "little")
        rsize = (h >> 4) & 0x3FFFF
        csize = (h >> 22) & 0x3FFFF
        pos += 5
        four = True
    section = block[pos:pos + csize]
    if len(section) != csize:
        raise ZstdError("literals: truncated compressed section")
    pos += csize
    off = 0
    if lit_type == 2:
        table, off = _huf_read_table(section)
        ctx.huf = table
    else:
        if ctx.huf is None:
            raise ZstdError("literals: treeless with no prior table")
        table = ctx.huf
    streams = section[off:]
    if not four:
        return _huf_decode_stream(table, streams, rsize), pos
    if len(streams) < 6:
        raise ZstdError("literals: truncated jump table")
    s1 = int.from_bytes(streams[0:2], "little")
    s2 = int.from_bytes(streams[2:4], "little")
    s3 = int.from_bytes(streams[4:6], "little")
    body = streams[6:]
    if s1 + s2 + s3 > len(body):
        raise ZstdError("literals: jump table exceeds section")
    r123 = (rsize + 3) // 4
    r4 = rsize - 3 * r123
    if r4 < 0:
        raise ZstdError("literals: negative fourth-stream size")
    parts = (body[:s1], body[s1:s1 + s2], body[s1 + s2:s1 + s2 + s3],
             body[s1 + s2 + s3:])
    out = bytearray()
    for part, r in zip(parts, (r123, r123, r123, r4)):
        out += _huf_decode_stream(table, part, r)
    return bytes(out), pos


def _decode_sequences(block: bytes, pos: int, lits: bytes,
                      out: bytearray, ctx: _FrameCtx) -> None:
    """Decode the sequences section and execute it against ``out``
    (the whole-frame output buffer — matches reach across blocks)."""
    b0 = block[pos]
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq = b0
        pos += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | block[pos + 1]
        pos += 2
    else:
        nseq = int.from_bytes(block[pos + 1:pos + 3], "little") + 0x7F00
        pos += 3
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("sequences: reserved mode bits set")
    ll_t, pos = _read_seq_table("ll", (modes >> 6) & 3, block, pos,
                                ctx, _LL_TABLE_DEFAULT)
    of_t, pos = _read_seq_table("of", (modes >> 4) & 3, block, pos,
                                ctx, _OF_TABLE_DEFAULT)
    ml_t, pos = _read_seq_table("ml", (modes >> 2) & 3, block, pos,
                                ctx, _ML_TABLE_DEFAULT)
    st = _BackStream(block[pos:])
    ll_s = st.read(ll_t.accuracy_log)
    of_s = st.read(of_t.accuracy_log)
    ml_s = st.read(ml_t.accuracy_log)
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t.symbols[of_s]
        if of_code > 31:
            raise ZstdError("sequences: offset code too large")
        offset_val = (1 << of_code) + st.read(of_code)
        ml_code = ml_t.symbols[ml_s]
        ml = _ML_BASE[ml_code] + st.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbols[ll_s]
        ll = _LL_BASE[ll_code] + st.read(_LL_BITS[ll_code])
        # resolve repeat offsets (RFC 8878 §3.1.1.5): values 1-3 are
        # history references, shifted by one when ll == 0
        rep = ctx.rep
        if offset_val > 3:
            offset = offset_val - 3
            ctx.rep = [offset, rep[0], rep[1]]
        else:
            idx = offset_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                ctx.rep = [rep[1], rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                ctx.rep = [rep[2], rep[0], rep[1]]
            else:  # idx == 3: first repeat minus one
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("sequences: zero repeat offset")
                ctx.rep = [offset, rep[0], rep[1]]
        # execute
        if lit_pos + ll > len(lits):
            raise ZstdError("sequences: literal run past literals")
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ZstdError("sequences: match offset out of range")
        if offset >= ml:
            start = len(out) - offset
            out += out[start:start + ml]
        else:
            for _ in range(ml):
                out.append(out[-offset])
        if i < nseq - 1:
            ll_s = ll_t.baseline[ll_s] + st.read(ll_t.num_bits[ll_s])
            ml_s = ml_t.baseline[ml_s] + st.read(ml_t.num_bits[ml_s])
            of_s = of_t.baseline[of_s] + st.read(of_t.num_bits[of_s])
    if st.remaining != 0:
        raise ZstdError("sequences: bitstream not fully consumed")
    out += lits[lit_pos:]


def _decode_frame(data: bytes, pos: int) -> tuple[bytes, int]:
    fhd = data[pos]
    pos += 1
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:  # bit 3 reserved (bit 4 "unused" must be ignored)
        raise ZstdError("frame header: reserved bit set")
    checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    if not single_segment:
        pos += 1  # window descriptor (we keep the whole frame in memory)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if int.from_bytes(data[pos:pos + did_size], "little") != 0:
            raise ZstdError("dictionaries are not supported")
        pos += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        fcs = int.from_bytes(data[pos:pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    out = bytearray()
    ctx = _FrameCtx()
    while True:
        if pos + 3 > len(data):
            raise ZstdError("truncated block header")
        bh = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            blk = data[pos:pos + bsize]
            if len(blk) != bsize:
                raise ZstdError("truncated raw block")
            out += blk
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ZstdError("truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:  # compressed
            blk = data[pos:pos + bsize]
            if len(blk) != bsize:
                raise ZstdError("truncated compressed block")
            pos += bsize
            lits, lpos = _decode_literals(blk, 0, ctx)
            _decode_sequences(blk, lpos, lits, out, ctx)
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if checksum:
        want = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ZstdError("content checksum mismatch")
    if fcs is not None and fcs != len(out):
        raise ZstdError(
            f"frame content size {fcs} != decoded {len(out)}")
    return bytes(out), pos


_STORE_BLOCK = 128 * 1024  # spec block-size ceiling
# A single-segment frame's implied decoder window equals its content
# size, and conforming decoders may refuse windows above the default
# limit (libzstd ZSTD_WINDOWLOG_LIMIT_DEFAULT = 27 → 128 MiB).  Cap
# one frame at that bound and emit a frame SEQUENCE beyond it — a
# concatenated stream is equally valid RFC 8878 and every decoder
# (ours included, see decompress) consumes it (r13 ADVICE).
_MAX_FRAME = 1 << 27


def compress(data: bytes) -> bytes:
    """STORE-MODE zstd frame(s): single-segment header with the exact
    frame content size, raw (uncompressed) blocks of ≤ 128 KiB, and
    an XXH64 content checksum; payloads over 128 MiB are emitted as a
    sequence of such frames so the implied window never exceeds the
    default decoder limit.  This is a fully spec-compliant RFC
    8878 stream any zstd decoder accepts (verified against the real
    libzstd in tests) — it just performs no entropy compression:
    real FSE/Huffman *encoding* requires the sequence-search half
    the spec deliberately leaves to implementations, which a pure-
    Python client cannot do at useful speed.  Use gzip/snappy/lz4
    when produce-side ratio matters; this exists so a zstd-configured
    pipeline stays wire-compatible end-to-end."""
    if len(data) > _MAX_FRAME:
        return b"".join(compress(data[i:i + _MAX_FRAME])
                        for i in range(0, len(data), _MAX_FRAME))
    n = len(data)
    if n < 256:
        fcs_flag, fcs = 0, n.to_bytes(1, "little")
    elif n - 256 <= 0xFFFF:
        fcs_flag, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n <= 0xFFFFFFFF:
        fcs_flag, fcs = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, n.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | 0x04  # single-segment + checksum
    out = bytearray(ZSTD_MAGIC.to_bytes(4, "little"))
    out.append(fhd)
    out += fcs
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, raw, size 0
    else:
        for i in range(0, n, _STORE_BLOCK):
            blk = data[i:i + _STORE_BLOCK]
            last = 1 if i + _STORE_BLOCK >= n else 0
            out += (last | (len(blk) << 3)).to_bytes(3, "little")
            out += blk
    out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode a stream of zstd frames (skippable frames skipped).
    Corruption and truncation raise ZstdError (a ValueError), never
    an internal IndexError."""
    out = bytearray()
    pos = 0
    try:
        while pos < len(data):
            magic = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
                if pos + 4 > len(data):
                    raise ZstdError("truncated input")
                size = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
                if pos + size > len(data):
                    raise ZstdError("truncated input")
                pos += size
                continue
            if magic != ZSTD_MAGIC:
                raise ZstdError(f"bad frame magic 0x{magic:08X}")
            frame, pos = _decode_frame(data, pos)
            out += frame
        return bytes(out)
    except IndexError:
        raise ZstdError("truncated input") from None
