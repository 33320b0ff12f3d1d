"""Event-time windowing — tumbling / hopping / session.

goka leaves windowing to user callbacks over per-key state; a Spark
engine gets it natively (and scalably: windows are just grouping
expressions, so partial aggregation + AQE apply).  Emitted window
bounds are epoch-micros longs, stable across engines.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts: str, duration: str, keys: list[str],
             aggs: dict[str, Column]) -> DataFrame:
    """Fixed non-overlapping windows, epoch-aligned."""
    w = F.window(ts, duration)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start_us", F.unix_micros(F.col("_w.start")))
        .drop("_w")
    )


def hopping(df: DataFrame, ts: str, duration: str, slide: str, keys: list[str],
            aggs: dict[str, Column]) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window(ts, duration, slide)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("window_start_us", F.unix_micros(F.col("_w.start")))
        .drop("_w")
    )


def session(df: DataFrame, ts: str, gap: str, keys: list[str],
            aggs: dict[str, Column]) -> DataFrame:
    """Gap-based session windows per key; start = first event time."""
    w = F.session_window(ts, gap)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("session_start_us", F.unix_micros(F.col("_w.start")))
        .drop("_w")
    )
