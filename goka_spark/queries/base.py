"""Shared helpers for query definitions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load parquet topic datasets. Column-pruning/pushdown flow from
    the declarative plan into these scans.

    ``events.ts`` is written as TIMESTAMP(NANOS), which the Spark
    parquet reader rejects; read it as long ns and floor to micros
    (identical to DuckDB's ns→us truncation).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # deterministic wall-clock semantics regardless of driver TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for n in names or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[n] = df
    return out
