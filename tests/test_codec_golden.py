"""Golden cross-checks of the pure-Python snappy/lz4 codecs against a
REAL independent implementation (the codecs bundled inside pyarrow's
Arrow C++ build: google snappy, lz4, lz4frame) plus hand-assembled
spec-derived byte vectors.

r11 ADVICE: the round-trip suites were self-referential — a symmetric
encode+decode bug would pass CI yet fail against a real broker peer.
These tests close that: pyarrow's codecs decode OUR output and we
decode THEIRS, in both block and frame form, plus fixed golden bytes
assembled directly from the public format descriptions.
"""

import pytest

import pyarrow as pa

from goka_spark import lz4_codec, snappy_codec

CORPUS = [
    b"",
    b"a",
    b"hello world",
    b"hello hello hello hello world world world " * 40,
    bytes(range(256)) * 300,          # poorly compressible
    b"\x00" * 100_000,                # long runs / overlapping matches
    b"abcdefgh" * 20_000,             # period-8 matches crossing blocks
    ("the quick brown fox jumps over the lazy dog. " * 3000).encode(),
]


def _ids(xs):
    return [f"len{len(x)}" for x in xs]


# ---------------------------------------------------------------- snappy

@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_snappy_block_decodes_reference_output(data):
    ref = pa.Codec("snappy").compress(data, asbytes=True)
    assert snappy_codec._decompress_block(ref) == data


@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_reference_decodes_our_snappy_block(data):
    ours = snappy_codec._compress_block(data)
    got = pa.Codec("snappy").decompress(
        ours, decompressed_size=len(data), asbytes=True)
    assert got == data


def test_snappy_golden_bytes():
    """Hand-assembled from format_description.txt: varint length 11,
    literal tag (n-1)<<2 for 'hello hello' would be 11 literals —
    instead use a copy: 6 literals 'hello ' then copy(off=6, len=5).
    Tag byte for 2-byte-offset copy of length 5: ((5-1)<<2)|2 = 0x12."""
    golden = bytes([11]) + bytes([(6 - 1) << 2]) + b"hello " \
        + bytes([((5 - 1) << 2) | 2]) + (6).to_bytes(2, "little")
    assert snappy_codec._decompress_block(golden) == b"hello hello"
    # 1-byte-offset copy form: tag ((len-4)<<2)|1 with off split
    # 3 high bits into tag bits 5-7: off=6 -> high=0, low=6
    golden1 = bytes([11]) + bytes([(6 - 1) << 2]) + b"hello " \
        + bytes([((5 - 4) << 2) | 1, 6])
    assert snappy_codec._decompress_block(golden1) == b"hello hello"


def test_snappy_xerial_frame_of_reference_blocks():
    """An xerial stream whose blocks were compressed by GOOGLE snappy
    (not ours) must decode — the framing and block layers must not
    assume our own encoder's choices."""
    data = b"xerial framing with reference blocks " * 2000
    blocks = [data[i:i + 32768] for i in range(0, len(data), 32768)]
    out = bytearray(snappy_codec._XERIAL_HEADER)
    for b in blocks:
        ref = pa.Codec("snappy").compress(b, asbytes=True)
        out += len(ref).to_bytes(4, "big") + ref
    assert snappy_codec.decompress(bytes(out)) == data


# ------------------------------------------------------------------ lz4

@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_lz4_block_decodes_reference_output(data):
    if not data:
        return  # lz4 raw blocks can't represent empty input
    ref = pa.Codec("lz4_raw").compress(data, asbytes=True)
    assert lz4_codec._decompress_block(ref) == data


@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_reference_decodes_our_lz4_block(data):
    if not data:
        return
    ours = lz4_codec._compress_block(data)
    got = pa.Codec("lz4_raw").decompress(
        ours, decompressed_size=len(data), asbytes=True)
    assert got == data


@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_lz4_frame_decodes_reference_output(data):
    ref = pa.Codec("lz4").compress(data, asbytes=True)
    assert lz4_codec.decompress(ref) == data


@pytest.mark.parametrize("data", CORPUS, ids=_ids(CORPUS))
def test_reference_decodes_our_lz4_frame(data):
    ours = lz4_codec.compress(data)
    got = pa.Codec("lz4").decompress(
        ours, decompressed_size=len(data), asbytes=True)
    assert got == data


def test_lz4_golden_block_bytes():
    """Spec-assembled block: token 0x64 = 6 literals + match len 4+4=8,
    offset 6 -> 'hello hello he' (6 lit + 8 match), then final
    literals-only sequence '!' (token 0x10)."""
    golden = bytes([0x64]) + b"hello " + (6).to_bytes(2, "little") \
        + bytes([0x10]) + b"!"
    assert lz4_codec._decompress_block(golden) == b"hello hello he!"


def test_lz4_linked_frame():
    """Block-LINKED frame (FLG B.Indep=0, the lz4frame default for
    multi-block input): block 2's match offsets reach back into block
    1's output — r11 ADVICE item.  Hand-assembled: block 1 = 16
    literals, block 2 = one copy of those 16 bytes from history."""
    part1 = b"0123456789abcdef"
    blk1 = bytes([0xF0, 1]) + part1          # 16 literals (15+1)
    # 0 literals, matchlen 16 -> token 0x0C (16-4=12), offset 16
    blk2 = bytes([0x0C]) + (16).to_bytes(2, "little")
    flg = 0b01000100                          # v01, LINKED, C.Checksum
    bd = 0b01000000
    header = bytes([flg, bd])
    frame = bytearray(lz4_codec.LZ4_MAGIC.to_bytes(4, "little"))
    frame += header
    frame.append((lz4_codec.xxh32(header) >> 8) & 0xFF)
    for blk in (blk1, blk2):
        frame += len(blk).to_bytes(4, "little") + blk
    frame += (0).to_bytes(4, "little")
    frame += lz4_codec.xxh32(part1 + part1).to_bytes(4, "little")
    assert lz4_codec.decompress(bytes(frame)) == part1 + part1


def test_lz4_linked_frame_window_slides():
    """Linked history is the trailing 64 KiB only; a 3-block linked
    frame where block 3 references bytes produced by block 2."""
    b1 = b"A" * 10
    b2 = b"B" * 10
    blk1 = bytes([0xA0]) + b1
    blk2 = bytes([0xA0]) + b2
    # block 3: one copy, offset 20 (back to start of b1), match len
    # 4+15+1=20 -> produces b1+b2 again.  Sequence layout per spec:
    # token, [lit ext], literals, offset, [match ext].
    blk3 = bytes([0x0F]) + (20).to_bytes(2, "little") + bytes([1])
    flg = 0b01000000                          # v01, LINKED, no checksums
    bd = 0b01000000
    header = bytes([flg, bd])
    frame = bytearray(lz4_codec.LZ4_MAGIC.to_bytes(4, "little"))
    frame += header
    frame.append((lz4_codec.xxh32(header) >> 8) & 0xFF)
    for blk in (blk1, blk2, blk3):
        frame += len(blk).to_bytes(4, "little") + blk
    frame += (0).to_bytes(4, "little")
    assert lz4_codec.decompress(bytes(frame)) == b1 + b2 + b1 + b2


def test_lz4_bd_code_follows_block_size():
    """r11 ADVICE: block_size > 64 KiB must not ship under BD code 4
    (strict decoders reject blocks above the declared max)."""
    data = bytes(range(256)) * 1500           # ~384 KiB, 2 blocks @256K
    frame = lz4_codec.compress(data, block_size=256 * 1024)
    assert frame[5] >> 4 == 5                 # BD code 5 = 256 KiB
    assert lz4_codec.decompress(frame) == data
    assert pa.Codec("lz4").decompress(
        frame, decompressed_size=len(data), asbytes=True) == data
    with pytest.raises(ValueError):
        lz4_codec.compress(b"x", block_size=8 * 1024 * 1024)


# ------------------------------------------------- truncation (snappy)

def test_snappy_truncated_fields_raise():
    data = b"hello hello hello hello world " * 50
    framed = snappy_codec.compress(data)
    raw = snappy_codec._compress_block(data)
    for cut in (framed[:9], framed[:14], framed[:20], raw[:1], raw[:3]):
        with pytest.raises(ValueError):
            snappy_codec.decompress(cut)
