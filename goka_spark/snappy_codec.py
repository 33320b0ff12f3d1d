"""Pure-Python snappy for Kafka RecordBatch compression.

Kafka's snappy codec wraps raw snappy blocks in snappy-java's
"xerial" stream framing (an 8-byte magic, two big-endian int32
version fields, then length-prefixed compressed blocks).  This module
implements both layers from the public format descriptions — google
snappy ``format_description.txt`` for the block format and
snappy-java's ``SnappyCodec``/``SnappyOutputStream`` framing — so the
wire client (goka_spark/kafka_wire.py) can produce and consume
snappy-compressed topics without any external library.  Reference
behavior: sarama ``CompressionSnappy`` (config.Producer.Compression),
which goka users commonly enable; decode additionally accepts raw
(unframed) snappy because old clients emitted it.

The compressor is a greedy 4-byte-hash matcher (the classic snappy
strategy): spec-compliant output, favoring simplicity over the last
few percent of ratio.  The decompressor handles every element type,
including overlapping copies, and validates the declared length.
"""

from __future__ import annotations

__all__ = ["compress", "decompress", "XERIAL_MAGIC"]

#: snappy-java stream header: magic, version=1, compat=1
XERIAL_MAGIC = b"\x82SNAPPY\x00"
_XERIAL_HEADER = XERIAL_MAGIC + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")

# Element tags (low 2 bits of the tag byte)
_LITERAL, _COPY_1B, _COPY_2B, _COPY_4B = 0, 1, 2, 3

_MAX_BLOCK = 32 * 1024  # snappy-java default block size


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    n = end - start
    if n <= 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    elif n <= 1 << 8:
        out.append(60 << 2)
        out += (n - 1).to_bytes(1, "little")
    elif n <= 1 << 16:
        out.append(61 << 2)
        out += (n - 1).to_bytes(2, "little")
    elif n <= 1 << 24:
        out.append(62 << 2)
        out += (n - 1).to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += (n - 1).to_bytes(4, "little")
    out += data[start:end]


def _compress_block(data: bytes) -> bytes:
    """One raw snappy block: varint uncompressed length, then a
    sequence of literal / copy elements (greedy 4-byte matches,
    2-byte-offset copies of length ≤ 64)."""
    out = bytearray()
    n = len(data)
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    total = len(data)
    table: dict[bytes, int] = {}
    i = lit = 0
    while i + 4 <= total:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > 0xFFFF:
            i += 1
            continue
        _emit_literal(out, data, lit, i)
        k = 4
        while i + k < total and k < 64 and data[j + k] == data[i + k]:
            k += 1
        out.append(((k - 1) << 2) | _COPY_2B)
        out += (i - j).to_bytes(2, "little")
        i += k
        lit = i
    _emit_literal(out, data, lit, total)
    return bytes(out)


def _read_le(data: bytes, pos: int, nbytes: int) -> int:
    """Bounds-checked little-endian field read: a slice that crosses
    the end of input silently yields a SHORT value from
    ``int.from_bytes``, which on the raw-unframed path (no checksum)
    can misparse a truncated stream before the declared-length check
    catches it — raise instead."""
    if pos + nbytes > len(data):
        raise ValueError("snappy: truncated field")
    return int.from_bytes(data[pos:pos + nbytes], "little")


def _decompress_block(data: bytes) -> bytes:
    total = shift = pos = 0
    while True:
        b = data[pos]
        pos += 1
        total |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    end = len(data)
    while pos < end:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == _LITERAL:
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = _read_le(data, pos, nbytes)
                pos += nbytes
            ln += 1
            if pos + ln > end:
                raise ValueError("snappy: literal runs past input")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == _COPY_1B:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == _COPY_2B:
            ln = (tag >> 2) + 1
            off = _read_le(data, pos, 2)
            pos += 2
        else:
            ln = (tag >> 2) + 1
            off = _read_le(data, pos, 4)
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        if off >= ln:
            start = len(out) - off
            out += out[start:start + ln]
        else:  # overlapping copy: repeat the trailing pattern
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != total:
        raise ValueError(
            f"snappy: declared length {total}, decoded {len(out)}")
    return bytes(out)


def compress(data: bytes, block_size: int = _MAX_BLOCK) -> bytes:
    """Xerial-framed snappy stream (what Kafka brokers/clients expect
    inside a snappy RecordBatch)."""
    out = bytearray(_XERIAL_HEADER)
    for i in range(0, len(data), block_size):
        block = _compress_block(data[i:i + block_size])
        out += len(block).to_bytes(4, "big")
        out += block
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode an xerial-framed stream; fall back to a raw snappy
    block when the magic is absent (pre-framing producers).
    Corruption and truncation raise ValueError, never an internal
    IndexError (fuzz-tested)."""
    try:
        if data[:8] != XERIAL_MAGIC:
            return _decompress_block(data)
        if len(data) < len(_XERIAL_HEADER):
            raise ValueError("snappy: truncated xerial header")
        pos = len(_XERIAL_HEADER)
        out = bytearray()
        end = len(data)
        while pos < end:
            if pos + 4 > end:
                raise ValueError("snappy: truncated xerial block header")
            ln = int.from_bytes(data[pos:pos + 4], "big")
            pos += 4
            if pos + ln > end:
                raise ValueError("snappy: truncated xerial block")
            out += _decompress_block(data[pos:pos + ln])
            pos += ln
        return bytes(out)
    except IndexError:
        raise ValueError("snappy: truncated input") from None
