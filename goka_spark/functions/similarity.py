"""Embedding similarity search — brute-force cosine top-k + LSH ANN.

- ``cosine_topk``: broadcast the (small) query set against the corpus;
  per-partition scoring stays JVM-side (zip_with/aggregate), global
  top-k via a window over each query (no global sort of the corpus).
- ``lsh_ann``: random-hyperplane LSH — sign-bit bucket per vector,
  candidates = bucket co-residents (multi-probe by dropping one bit),
  exact cosine only within buckets.  The 100 TB path: buckets shrink
  the candidate set by ~2^bits.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5) -> DataFrame:
    """For each query vector, the top-k nearest corpus vectors by
    cosine (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"),
                F.col("rk").cast("long").alias("rk"))
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of the vector against each hyperplane."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
            k: int = 5, bits: int = 8, dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket
    (multi-probe: exact bucket + one-bit-flipped neighbors)."""
    planes = hyperplanes(dim, bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("bucket", lsh_bucket(F.col("_cv"), planes))
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("bucket", lsh_bucket(F.col("_qv"), planes)) \
     .withColumn("probe", F.explode(probes)).drop("bucket")
    scored = (
        c.join(F.broadcast(q), (F.col("probe") == F.col("bucket"))
               & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cos"),
                F.col("rk").cast("long").alias("rk"))
    )


def cosine_near_pairs(df: DataFrame, id_col: str, vec_col: str,
                      threshold: float, probe_limit: int | None = None) -> DataFrame:
    """All pairs (i<j) with cosine above threshold; optionally restrict
    the probe side to id < probe_limit to bound the cross product."""
    a = df.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("_va"))
    if probe_limit is not None:
        a = a.filter(F.col("id_a") < probe_limit)
    b = df.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("_vb"))
    return (
        F.broadcast(a).crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos") > threshold)
        .select("id_a", "id_b", "cos")
    )
