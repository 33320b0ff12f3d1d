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


def histogram_quantiles(df, value_col: str, keys: list,
                        lo: float, hi: float, n_bins: int = 256,
                        qs: tuple = (0.5, 0.9)):
    """Mergeable histogram-sketch quantiles — the deterministic
    bounded-memory alternative value_quantiles' docstring points at:
    fixed equi-width bins over [lo, hi) (counts are exact integers —
    shards sketch independently and merge by cell-wise add, the CMS
    discipline), quantile = lower edge of the first bin whose
    cumulative count reaches ceil(q·n) (the inverted-CDF convention,
    integer-exact — no float interpolation to disagree on).

    Error is bounded by the bin width (hi-lo)/n_bins; n_bins·|keys|
    integers of state regardless of row count.  One scan + one
    (keys, bin) hash-agg + a per-key cumulative window over ≤ n_bins
    rows.  Returns one row per key with a column per quantile
    (`p50`, `p90`, ... from ``qs``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    width = (hi - lo) / n_bins
    b = F.least(F.greatest(
        F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    binned = (df.select(*keys, b.alias("_bin"))
              .groupBy(*keys, "_bin").agg(F.count("*").alias("_c")))
    w = Window.partitionBy(*keys).orderBy("_bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(*keys)
    cum = (binned
           .withColumn("_cum", F.sum("_c").over(w))
           .withColumn("_n", F.sum("_c").over(tot)))
    aggs = []
    for q in qs:
        name = f"p{int(q * 100)}"
        hit = F.when(
            F.col("_cum") >= F.ceil(F.col("_n") * q),
            F.lit(lo) + F.col("_bin") * width)
        aggs.append(F.min(hit).alias(name))
    return cum.groupBy(*keys).agg(*aggs)
