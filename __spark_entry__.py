"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose every SURVEY.md §2 operator with its DuckDB
oracle (keys without an oracle get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from goka_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: goka-style processor group — events keyed by user,
    co-partitioned customer join + broadcast nation lookup, folded
    into a per-nation volume table (SURVEY §2 A6)."""
    from goka_spark.queries.core import stream_lookup_join

    return stream_lookup_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
