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

    ``events.ts`` has shipped in two physical forms across driver
    testdata generations: TIMESTAMP(NANOS) (read as long ns under
    ``nanosAsLong`` and floored to micros, identical to DuckDB's
    ns→us truncation) and plain TIMESTAMP(MICROS) (read natively,
    possibly as TIMESTAMP_NTZ). Normalize both to a session-TZ
    TIMESTAMP so downstream event-time logic sees one type.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # deterministic wall-clock semantics regardless of driver TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for n in names or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":  # legacy nanos-as-long layout
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type == "timestamp_ntz":  # → session-TZ ts
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            elif ts_type != "timestamp":
                # fail loudly on a future testdata regression rather
                # than silently casting (e.g. string/double) to NULLs
                raise ValueError(f"unexpected events.ts dtype: {ts_type}")
        out[n] = df
    return out
