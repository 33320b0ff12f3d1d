"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next
to typed metadata.  The heavy per-blob work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas``
so blobs never round-trip through the driver and batches stream
partition-local.  The actual codec libraries (PIL/ffmpeg/etc.) are
not in this container: ``decode_image_meta`` uses them when
importable, else a deterministic stub — the Spark-side plumbing
(schema, batching, partitioning) is real either way.
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
