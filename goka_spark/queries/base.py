"""Shared helpers for query definitions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# SQL confs the engine's IO contract PINS — part of load()'s documented
# behavior, not a hidden side effect: nanosAsLong makes legacy
# TIMESTAMP(NANOS) parquet readable (floored to micros, identical to
# DuckDB's ns->us truncation) and UTC gives deterministic wall-clock
# event-time semantics regardless of driver TZ.  ``goka_spark.session.
# get_session`` sets the same values at build time; this path exists
# for externally-built sessions (the correctness driver's).
_IO_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_io_conf(spark: SparkSession) -> None:
    """Idempotently pin ``_IO_CONF``: reads the effective value first
    and only writes on a difference, so repeated ``load()`` calls are
    conf no-ops (no plan-cache churn, no repeated mutation)."""
    for k, v in _IO_CONF.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


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
    ensure_io_conf(spark)
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
