"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next
to typed metadata.  The heavy per-blob work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas``
so blobs never round-trip through the driver and batches stream
partition-local.  Compressed codec libraries (PIL/ffmpeg/etc.) are
not in this container: ``decode_image_meta`` uses them when
importable, else a deterministic stub.  UNCOMPRESSED formats need no
library: the P6 PPM encoder/parser/resizer below is a complete real
codec (see ``ppm_parse``), so the decode path is exercised with true
byte-level pixel work end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, fmt string"
)


def attach_blob(df: DataFrame, text_col: str = "text",
                blob_col: str = "blob") -> DataFrame:
    """Materialize a binary payload column (stand-in for real image
    bytes; in production this is the parquet binary column itself)."""
    return df.withColumn(blob_col, F.encode(F.col(text_col), "UTF-8"))


def _decode_one(blob: bytes) -> tuple[int, int, str]:
    """Decode image dims. Real decoder when available, else a
    deterministic fake derived from the payload length."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob))
        return img.width, img.height, img.format or "unknown"
    except Exception:
        n = len(blob)
        return (n * 7) % 640, (n * 13) % 480, "stub"


def decode_image_meta(df: DataFrame, id_col: str = "doc_id",
                      blob_col: str = "blob") -> DataFrame:
    """mapInPandas decode: per-batch, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(b) for b in pdf[blob_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[blob_col].str.len().astype("int64"),
                "width": pd.Series([m[0] for m in meta], dtype="int64"),
                "height": pd.Series([m[1] for m in meta], dtype="int64"),
                "fmt": [m[2] for m in meta],
            })

    return df.select(id_col, blob_col).mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      blob_col: str = "blob", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (decoder stubbed — frame count faked from payload length)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                n_frames = max(len(b) // 16, 1)
                rows.extend((int(i), f) for f in range(0, n_frames, every_n))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx"])

    return df.select(id_col, blob_col).mapInPandas(run, "doc_id long, frame_idx long")

def resize_image_stub(df: DataFrame, id_col: str = "doc_id",
                      blob_col: str = "blob", width: int = 64,
                      height: int = 64) -> DataFrame:
    """Resize plumbing: binary in → binary out, Arrow-batched.  With a
    real codec (PIL) this is decode→resize→re-encode per batch; here
    the transform is a deterministic stub (truncate/cycle the payload
    to exactly width*height bytes) so schema, batch shape and
    partitioning are exercised end to end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                reps = (target // max(len(b), 1)) + 1
                out.append((b * reps)[:target])
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "blob": out,
                "width": pd.Series([width] * len(pdf), dtype="int64"),
                "height": pd.Series([height] * len(pdf), dtype="int64"),
            })

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, blob binary, width long, height long")


# -- REAL codec path: P6 PPM (binary portable pixmap) ----------------
# Uncompressed formats need no external library — the parser below is
# a complete, real decoder (magic, dimension/maxval header with
# whitespace+comment handling, pixel buffer validation), so the
# multimodal plumbing is exercised end-to-end with true byte-level
# decode work, not a stub.  Compressed codecs (JPEG/PNG/video) remain
# behind the PIL/ffmpeg import-try in decode_image_meta.

def ppm_encode_gray(width: int, height: int, seed: int) -> bytes:
    """Build a REAL P6 image: gray pixel i has value (seed*31+i)%256
    (deterministic, oracle-computable)."""
    import numpy as np

    vals = (seed * 31 + np.arange(width * height)) % 256
    pixels = np.repeat(vals.astype(np.uint8), 3)
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def ppm_parse(blob: bytes) -> tuple[int, int, int, "object"]:
    """Parse a P6 blob → (width, height, maxval, HxWx3 uint8 array).
    Raises ValueError on malformed input (wrong magic, short pixel
    buffer) — a real parser fails loudly, the stub never could."""
    import numpy as np

    if not blob.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    # header tokens: magic, width, height, maxval; '#' comments legal
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    pix = np.frombuffer(blob, dtype=np.uint8, offset=pos)
    if pix.size < w * h * 3:
        raise ValueError(f"short pixel buffer: {pix.size} < {w * h * 3}")
    return w, h, maxval, pix[:w * h * 3].reshape(h, w, 3)


def encode_ppm(df: DataFrame, id_col: str, width_col: str, height_col: str,
               seed_col: str) -> DataFrame:
    """Materialize real P6 blobs per row (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "blob": [ppm_encode_gray(int(w), int(h), int(s))
                         for w, h, s in zip(pdf[width_col], pdf[height_col],
                                            pdf[seed_col])],
            })

    return df.select(id_col, width_col, height_col, seed_col) \
        .mapInPandas(run, "doc_id long, blob binary")


def decode_ppm_meta(df: DataFrame, id_col: str = "doc_id",
                    blob_col: str = "blob") -> DataFrame:
    """REAL decode: parse every blob's header + pixels; emit typed
    metadata and the red-channel mean (an actual pixel statistic)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                w, h, maxval, pix = ppm_parse(bytes(b))
                rows.append((int(i), w, h, maxval,
                             round(float(pix[:, :, 0].mean()), 4)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "maxval", "mean_r"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, width long, height long, maxval long, mean_r double")


def resize_ppm(df: DataFrame, out_w: int, out_h: int,
               id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """REAL nearest-neighbor resize: decode → index-grid sample →
    re-encode P6.  The per-batch work is two numpy gathers."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                w, h, maxval, pix = ppm_parse(bytes(b))
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = pix[ys[:, None], xs[None, :], :]
                blob = b"P6\n%d %d\n%d\n" % (out_w, out_h, maxval) \
                    + resized.astype(np.uint8).tobytes()
                out.append((int(i), blob))
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, blob binary")


def wav_encode_pcm16(n_samples: int, rate: int, seed: int) -> bytes:
    """Build a REAL RIFF/WAVE file: canonical 44-byte header + mono
    16-bit PCM data; sample i is ((seed*7 + i*13) % 65536) - 32768
    (deterministic, oracle-computable)."""
    import struct

    import numpy as np

    samples = (((seed * 7 + np.arange(n_samples) * 13) % 65536) - 32768) \
        .astype("<i2")
    data = samples.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def wav_parse(blob: bytes) -> tuple[int, int, int, "object"]:
    """Parse RIFF/WAVE → (n_channels, sample_rate, bits, int16 array).
    Real chunk-walking parser: validates magics, iterates chunks to
    find fmt/data (extra chunks like LIST are skipped correctly)."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos:pos + 4], struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported, got fmt={audio_fmt} bits={bits}")
    return n_ch, rate, bits, np.frombuffer(data, dtype="<i2")


def decode_wav_meta(df: DataFrame, id_col: str = "doc_id",
                    blob_col: str = "blob") -> DataFrame:
    """REAL audio decode per Arrow batch: sample count, rate, and RMS
    amplitude (true signal statistic; integer squares sum exactly in
    float64, so any engine reproduces it bit-for-bit)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                n_ch, rate, _, samples = wav_parse(bytes(b))
                rms = float(np.sqrt((samples.astype("f8") ** 2).mean()))
                rows.append((int(i), rate, len(samples), round(rms, 4)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "rate", "n_samples", "rms"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, rate long, n_samples long, rms double")


def encode_wav(df: DataFrame, id_col: str, n_col: str, seed_col: str,
               rate: int = 8000) -> DataFrame:
    """Materialize real WAV blobs per row (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "blob": [wav_encode_pcm16(int(n), rate, int(s))
                         for n, s in zip(pdf[n_col], pdf[seed_col])],
            })

    return df.select(id_col, n_col, seed_col) \
        .mapInPandas(run, "doc_id long, blob binary")


def encode_ppm_stream(df: DataFrame, id_col: str, n_frames_col: str,
                      width: int, height: int,
                      seed_mult: int = 100) -> DataFrame:
    """Materialize a real multi-frame P6 stream per row; frame j of
    row id uses seed ``id*seed_mult + j``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, nf in zip(pdf[id_col], pdf[n_frames_col]):
                blob = b"".join(
                    ppm_encode_gray(width, height, int(i) * seed_mult + j)
                    for j in range(int(nf)))
                out.append((int(i), blob))
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    return df.select(id_col, n_frames_col) \
        .mapInPandas(run, "doc_id long, blob binary")


def ppm_stream_parse(blob: bytes) -> list:
    """Parse a VIDEO as a concatenated stream of P6 frames (the
    uncompressed-video analog): repeatedly parse one frame, advance by
    its exact byte length, until the buffer is consumed."""
    frames, pos = [], 0
    while pos < len(blob):
        w, h, maxval, pix = ppm_parse(blob[pos:])
        frames.append(pix)
        # frame length = header bytes + pixel bytes (recompute header)
        hdr = b"P6\n%d %d\n%d\n" % (w, h, maxval)
        pos += len(hdr) + w * h * 3
    return frames


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 blob_col: str = "blob", every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse the frame stream, keep every
    ``every_n``-th frame, emit its true per-frame pixel mean."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                for j, pix in enumerate(ppm_stream_parse(bytes(b))):
                    if j % every_n == 0:
                        rows.append((int(i), j, pix.shape[1], pix.shape[0],
                                     round(float(pix[:, :, 0].mean()), 4)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "width", "height", "mean_r"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, frame_idx long, width long, height long, mean_r double")


def image_features(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob", bins: int = 16) -> DataFrame:
    """Feature extraction: binary → array<float>.  The byte-value
    histogram (normalized, ``bins`` buckets) is a REAL feature — no
    codec needed — and the numpy bincount per Arrow batch is the same
    vectorized shape a learned-embedding extractor would use."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(arr // (256 // bins),
                                   minlength=bins)[:bins]
                feats.append((hist / arr.size).astype("float64").tolist())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "features": feats,
            })

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, features array<double>")


def ppm_encode_quad(width: int, height: int, seed: int) -> bytes:
    """P6 image with a seed-shifted quadratic TEXTURE: gray pixel i
    is ((i+seed)²) % 256.  Unlike the linear ramp (whose gradient
    signs are seed-invariant — every ramp has the same dHash), the
    quadratic's wrap pattern shifts with the seed, so different seeds
    give separable perceptual hashes while staying closed-form for
    the SQL oracle."""
    import numpy as np

    i = np.arange(width * height, dtype=np.int64) + seed
    vals = (i * i) % 256
    pixels = np.repeat(vals.astype(np.uint8), 3)
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def encode_ppm_quad(df: DataFrame, id_col: str, width_col: str,
                    height_col: str, seed_col: str) -> DataFrame:
    """Materialize quad-textured P6 blobs per row (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "blob": [ppm_encode_quad(int(w), int(h), int(s))
                         for w, h, s in zip(pdf[width_col],
                                            pdf[height_col],
                                            pdf[seed_col])]})

    return df.select(id_col, width_col, height_col, seed_col) \
        .mapInPandas(run, "doc_id long, blob binary")


def image_dhash(df: DataFrame, id_col: str = "doc_id",
                blob_col: str = "blob", grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded images —
    the standard near-duplicate fingerprint for image corpora (resize
    to a tiny (grid+1)×grid grid, hash the horizontal gradient
    signs): robust to re-encoding and scaling, cheap enough to run on
    every image of a crawl.

    The decode is the real P6 parser (``ppm_parse``), the resize uses
    the SAME floor index map as ``resize_ppm`` (``(i*src)//dst``), the
    luma proxy is the red channel (the encoder writes equal channels),
    and only 63 gradient bits pack (signed-BIGINT-safe — the
    simhash63 discipline), little-endian by bit index.  Because the
    synthetic pixels are a closed-form function of (seed, index), a
    SQL oracle reproduces the hash bit-for-bit WITHOUT decoding —
    which is exactly what makes the whole decode+resize+hash path
    driver-verifiable.  Arrow-batched; two numpy gathers per image."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                w, h, _, pix = ppm_parse(bytes(b))
                gray = pix[:, :, 0].astype(np.int64)
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid + 1) * w) // (grid + 1)
                g = gray[ys[:, None], xs[None, :]]
                bits = (g[:, :-1] > g[:, 1:]).flatten()[:63]
                hval = 0
                for k, v in enumerate(bits):
                    if v:
                        hval |= 1 << k
                out.append((int(i), hval))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, dhash long")


def wav_silence_report(df: DataFrame, id_col: str = "doc_id",
                       blob_col: str = "blob", window: int = 20,
                       silence_mean_abs: int = 8192) -> DataFrame:
    """Windowed silence detection over decoded PCM16 — the audio-
    pipeline trimming/VAD precursor: the signal is cut into full
    ``window``-sample frames; a frame is silent when its mean |sample|
    is below ``silence_mean_abs``.  The comparison is done on the
    INTEGER per-window Σ|s| (sum < thresh·window), so every output is
    an exact integer any engine reproduces — no float energy in the
    decision path.  Output: (doc_id, n_windows, n_silent, silent_e6,
    max_abs); the trailing partial window is excluded (documented).

    Same Arrow-batched mapInPandas shape as decode_wav_meta — real
    parse, numpy per batch, never per-row Python."""
    import numpy as np

    thresh_sum = int(silence_mean_abs) * int(window)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                _, _, _, samples = wav_parse(bytes(b))
                nw = len(samples) // window
                a = np.abs(samples[:nw * window].astype("i8")) \
                    .reshape(nw, window)
                sums = a.sum(axis=1)
                n_silent = int((sums < thresh_sum).sum())
                rows.append((int(i), nw, n_silent,
                             n_silent * 1_000_000 // nw if nw else 0,
                             int(np.abs(samples.astype("i8")).max())
                             if len(samples) else 0))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_windows", "n_silent", "silent_e6",
                "max_abs"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_windows long, n_silent long, "
             "silent_e6 long, max_abs long")


def wav_zcr_report(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob") -> DataFrame:
    """Zero-crossing-rate report over decoded PCM16 — the classic
    voiced/unvoiced (and tone-vs-noise) discriminator an audio
    curation pipeline computes next to energy: a crossing is counted
    at i when ``(s_i < 0) != (s_{i+1} < 0)`` (strict sign-bit
    comparison — no epsilon, no float), so ``n_crossings`` and
    ``zcr_e6 = n_crossings·10^6 // (n−1)`` are exact integers any
    engine reproduces from the sample law.  Clips with fewer than 2
    samples report (0, 0).

    Same Arrow-batched ``mapInPandas`` shape as
    ``wav_silence_report``: real RIFF parse, numpy per batch, never
    per-row Python.  Reference: the C30/C123 wav family; ZCR per
    Rabiner & Schafer, Digital Processing of Speech Signals (1978).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                _, _, _, samples = wav_parse(bytes(b))
                n = len(samples)
                if n < 2:
                    rows.append((int(i), n, 0, 0))
                    continue
                neg = samples < 0
                nc = int((neg[1:] != neg[:-1]).sum())
                rows.append((int(i), n, nc, nc * 1_000_000 // (n - 1)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "n_crossings", "zcr_e6"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_samples long, n_crossings long, zcr_e6 long")


def encode_ppm_stream_quad(df: DataFrame, id_col: str, n_frames_col: str,
                           width: int, height: int,
                           seed_mod: int = 3,
                           shot_len: int = 1) -> DataFrame:
    """Quad-textured frame stream: frame ``j`` of row ``id`` uses quad
    seed ``(id + j // shot_len) % seed_mod``, so streams contain
    REPEATED frames (the static-scene analog) that a frame-level
    dedup must find — and different seeds stay perceptually separable
    (the quad-texture law of ``ppm_encode_quad``).  ``shot_len > 1``
    holds each seed for that many consecutive frames, producing SHOTS
    (the cut-detection workload); the default 1 is the original
    per-frame law (j // 1 == j)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, nf in zip(pdf[id_col], pdf[n_frames_col]):
                blob = b"".join(
                    ppm_encode_quad(width, height,
                                    (int(i) + j // shot_len) % seed_mod)
                    for j in range(int(nf)))
                out.append((int(i), blob))
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    return df.select(id_col, n_frames_col) \
        .mapInPandas(run, "doc_id long, blob binary")


def frame_dhash(df: DataFrame, id_col: str = "doc_id",
                blob_col: str = "blob", grid: int = 8) -> DataFrame:
    """Per-FRAME perceptual dHash over a parsed frame stream —
    ``image_dhash``'s exact kernel (floor-map resize, red-channel
    luma, 63 little-endian gradient bits) applied to every frame of
    the concatenated-P6 video analog.  The unit of near-dup detection
    moves from the image to the frame: static scenes and looped
    segments collapse onto one hash.  Arrow-batched ``mapInPandas``;
    output (doc_id, frame_idx, dhash)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                for j, pix in enumerate(ppm_stream_parse(bytes(b))):
                    h_, w_ = pix.shape[0], pix.shape[1]
                    gray = pix[:, :, 0].astype(np.int64)
                    ys = (np.arange(grid) * h_) // grid
                    xs = (np.arange(grid + 1) * w_) // (grid + 1)
                    g = gray[ys[:, None], xs[None, :]]
                    bits = (g[:, :-1] > g[:, 1:]).flatten()[:63]
                    hval = 0
                    for k, v in enumerate(bits):
                        if v:
                            hval |= 1 << k
                    out.append((int(i), j, hval))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx",
                                             "dhash"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, frame_idx long, dhash long")


def image_wht_hash(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "blob", grid: int = 8) -> DataFrame:
    """Frequency-domain perceptual hash over REAL decoded images —
    the pHash family (resize tiny, transform to the frequency domain,
    hash coefficient signs), with the 2-D Walsh–Hadamard transform in
    place of pHash's DCT: H has ±1 entries, so every coefficient is
    an EXACT integer of the pixel values and the whole
    decode→resize→transform→hash path is bit-replayable by a SQL
    oracle (a float DCT would put 64 cosine roundings between the
    pixels and each sign bit).  WHT(u,v) = Σ_{r,c} pix(r,c)·
    (−1)^{popcount(r&u)+popcount(c&v)} — the same sequency analysis
    pHash reads, complementary to dHash's spatial gradients (dHash
    sees local edges; WHT sees global texture/frequency structure).

    Decode is the real P6 parser, resize the same floor index map as
    ``image_dhash``, luma the red channel; 63 sign bits pack (DC
    coefficient (0,0) skipped — it is mean brightness, the bit every
    normalization would flip), little-endian by coefficient index
    u·grid+v−1.  Arrow-batched; one (64×64)·n_images integer matmul
    per batch via the Sylvester-construction Hadamard matrix."""
    import numpy as np

    # Sylvester doubling only produces power-of-two orders; any other
    # grid would overshoot and fail the matmul with an opaque shape
    # error downstream (r9 ADVICE)
    if grid <= 0 or grid & (grid - 1):
        raise ValueError(
            f"image_wht_hash grid must be a power of two, got {grid}")
    hm = np.array([[1]], dtype=np.int64)
    while hm.shape[0] < grid:
        hm = np.block([[hm, hm], [hm, -hm]])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                w, h, _, pix = ppm_parse(bytes(b))
                gray = pix[:, :, 0].astype(np.int64)
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                g = gray[ys[:, None], xs[None, :]]
                coef = hm @ g @ hm                 # exact integers
                bits = (coef.flatten()[1:64] > 0)
                hval = 0
                for k, v in enumerate(bits):
                    if v:
                        hval |= 1 << k
                out.append((int(i), hval))
            yield pd.DataFrame(out, columns=["doc_id", "wht_hash"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, wht_hash long")


def image_moment_stats(df: DataFrame, id_col: str = "doc_id",
                       blob_col: str = "blob") -> DataFrame:
    """Per-image gray-channel integer moments from REAL decoded P6
    pixels: (n_pixels, sum, sum-of-squares) — the exact-arithmetic
    inputs every contrast/exposure gate needs (pixel values are
    small ints, so the sums are exact and a closed-form oracle can
    replay them).  Arrow-batched; gray = the red channel (the quad
    encoder writes r=g=b)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, s1, s2 = [], [], []
            for b in pdf[blob_col]:
                _, _, _, px = ppm_parse(bytes(b))
                gray = px.reshape(-1, 3)[:, 0].astype(np.int64)
                ns.append(int(gray.size))
                s1.append(int(gray.sum()))
                s2.append(int((gray * gray).sum()))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_pixels": ns, "px_sum": s1, "px_sum2": s2,
            })

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_pixels long, px_sum long, px_sum2 long")


def wav_headroom_report(df: DataFrame, id_col: str = "doc_id",
                        blob_col: str = "blob",
                        hot_abs: int = 30000) -> DataFrame:
    """Loudness-HEADROOM audit over decoded PCM16 — the clipping
    gate of an audio ingest pipeline: per clip, the count of hot
    samples (|s| ≥ ``hot_abs``, near the int16 rails) and the peak
    amplitude.  A clip whose hot share is high was recorded too hot
    (or re-encoded from clipped material) and distorts any
    spectral feature downstream.  All-integer outputs: n_samples,
    n_hot, peak_abs, hot_e6 = n_hot·1e6 DIV n.  Arrow-batched
    mapInPandas, real RIFF parse, numpy per batch."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, nh, pk = [], [], []
            for b in pdf[blob_col]:
                _, _, _, samples = wav_parse(bytes(b))
                a = np.abs(samples.astype(np.int64))
                ns.append(int(a.size))
                nh.append(int((a >= hot_abs).sum()))
                pk.append(int(a.max()) if a.size else 0)
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_samples": ns, "n_hot": nh, "peak_abs": pk,
            })

    out = df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_samples long, n_hot long, peak_abs long")
    return out.withColumn(
        "hot_e6",
        F.expr("n_hot * 1000000L DIV greatest(n_samples, 1L)")
        .cast("long"))


def wav_diff_report(df: DataFrame, id_col: str = "doc_id",
                    blob_col: str = "blob") -> DataFrame:
    """First-difference energy report over decoded PCM16 — the
    exact-integer spectral-TILT estimator (Kedem 1986: difference-
    filter energy ratios are the classic ZCR-family spectral-centroid
    family) plus the transient/click detector an audio curation
    pipeline runs beside silence/ZCR/headroom: per clip,

    - ``e_total`` = Σ s_i²  and  ``e_diff`` = Σ (s_i − s_{i−1})²
      (exact int64 — bounded for clips ≤ ~8M samples at 16 bit);
    - ``tilt_e6`` = e_diff·10⁶ // (4·e_total) ∈ [0, 10⁶]: 0 for DC,
      ~10⁶ for Nyquist-rate alternation (for a pure tone it equals
      sin²(πf/f_s) — a monotone frequency proxy with NO float DFT,
      so the oracle replays it exactly from the sample law);
    - ``n_transients`` = #{i : |s_i − s_{i−1}| > 32768}: a jump past
      half the int16 range inside ONE sample period is a waveform
      discontinuity (click/pop/splice), not program material.

    Clips with < 2 samples report (0, 0, 0, 0).  Arrow-batched
    ``mapInPandas``, real RIFF parse, numpy per batch — the same
    shape as ``wav_zcr_report``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                _, _, _, samples = wav_parse(bytes(b))
                s = samples.astype(np.int64)
                n = len(s)
                if n < 2:
                    rows.append((int(i), n, 0, 0, 0, 0))
                    continue
                d = s[1:] - s[:-1]
                et = int((s * s).sum())
                ed = int((d * d).sum())
                # max(·,1) guard mirrors the oracle's greatest(4*et,1)
                # exactly (r13 ADVICE): an all-zero clip has ed == 0
                # too, so both sides report tilt 0 — never a div-0.
                rows.append((int(i), n, et, ed,
                             ed * 1_000_000 // max(4 * et, 1),
                             int((np.abs(d) > 32768).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "e_total", "e_diff",
                "tilt_e6", "n_transients"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_samples long, e_total long, e_diff long,"
             " tilt_e6 long, n_transients long")


def image_value_counts(df: DataFrame, id_col: str = "doc_id",
                       blob_col: str = "blob") -> DataFrame:
    """Per-image gray-value HISTOGRAM rows from REAL decoded P6
    pixels: one ``(doc_id, val, cnt)`` row per distinct gray value —
    the exact-integer input for entropy/posterization gates.  The
    histogram stays in integers so downstream micro-nat terms can be
    computed engine-side (Spark ``F.log`` vs DuckDB ``ln`` on
    IDENTICAL integer counts — the doc_entropy float discipline;
    numpy's ln never touches the data).  ≤ 256 rows per image.
    Arrow-batched; gray = the red channel (the synthetic encoders
    write r=g=b)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vals, cnts = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                _, _, _, px = ppm_parse(bytes(b))
                gray = px.reshape(-1, 3)[:, 0]
                v, c = np.unique(gray, return_counts=True)
                ids.extend([int(i)] * len(v))
                vals.extend(int(x) for x in v)
                cnts.extend(int(x) for x in c)
            yield pd.DataFrame({"doc_id": ids, "val": vals, "cnt": cnts})

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, val long, cnt long")


def frame_sad(df: DataFrame, id_col: str = "doc_id",
              blob_col: str = "blob") -> DataFrame:
    """Per-stream inter-frame SAD (sum of absolute differences) — the
    MOTION-intensity profile of a video QA pass, the quantitative
    complement of the binary cut detector (``frame_dhash`` lag): per
    stream, the number of frame transitions, how many are STATIC
    (SAD = 0 — repeated frames a sampler should skip), and the total
    absolute pixel difference across all transitions.  Pixel values
    are bytes, so every sum is an exact int64 (≤ 255·pixels·frames).
    Arrow-batched ``mapInPandas`` over the real concatenated-P6
    parse (``ppm_stream_parse``); gray = the red channel."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                frames = ppm_stream_parse(bytes(b))
                grays = [f.reshape(-1, 3)[:, 0].astype(np.int64)
                         for f in frames]
                nt = max(len(grays) - 1, 0)
                sads = [int(np.abs(grays[j + 1] - grays[j]).sum())
                        for j in range(nt)]
                rows.append((int(i), len(grays), nt,
                             sum(1 for s in sads if s == 0),
                             sum(sads)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_frames", "n_transitions", "n_static",
                "sad_total"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, n_frames long, n_transitions long,"
             " n_static long, sad_total long")


# Fixed-point DCT-II basis for the perceptual pHash: _PHASH_COS[x][u]
# = round(cos(π(2x+1)u/32)·4096) for x ∈ 0..15 (sample index), u ∈
# 0..7 (kept frequency).  Integerized ONCE here and baked verbatim
# into the SQL oracle as literals, so both engines run the IDENTICAL
# integer transform — no float DFT anywhere (the wav_spectral_tilt
# discipline applied to images).
import math as _math

_PHASH_COS = [[round(_math.cos(_math.pi * (2 * x + 1) * u / 32) * 4096)
               for u in range(8)]
              for x in range(16)]


def image_phash(df: DataFrame, id_col: str = "doc_id",
                blob_col: str = "blob") -> DataFrame:
    """Perceptual DCT hash (pHash) over REAL decoded images — the
    frequency-domain sibling of ``image_dhash`` (gradient signs) and
    the WHT dedup (±1 basis): resize to a 16×16 grid with the SAME
    floor index map as ``resize_ppm``, apply the fixed-point 2-D
    DCT-II (separable: coef = Cᵀ·g·C with the int64 ``_PHASH_COS``
    basis — exact integer arithmetic, |coef| ≤ 255·16²·4096² ≪ 2⁶³),
    keep the low-frequency 8×8 block, drop DC, and set bit k for
    each of the 63 remaining coefficients above the block mean
    (63·coef > Σcoef — one exact integer compare, no division).
    Classic pHash thresholds at the median; the mean variant keeps
    the whole law integer-exact and SQL-replayable.  Arrow-batched;
    two int64 matmuls per image."""
    import numpy as np

    C = np.array(_PHASH_COS, dtype=np.int64)  # 16×8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                w, h, _, pix = ppm_parse(bytes(b))
                gray = pix[:, :, 0].astype(np.int64)
                ys = (np.arange(16) * h) // 16
                xs = (np.arange(16) * w) // 16
                g = gray[ys[:, None], xs[None, :]]
                coef = C.T @ g @ C                  # 8×8 exact int64
                flat = coef.flatten()[1:]           # row-major, drop DC
                tot = int(flat.sum())
                hval = 0
                for k, v in enumerate(flat):
                    if 63 * int(v) > tot:
                        hval |= 1 << k
                out.append((int(i), hval))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return df.select(id_col, blob_col).mapInPandas(
        run, "doc_id long, phash long")
