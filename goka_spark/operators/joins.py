"""Join strategies beyond plain equi-joins.

- ``as_of_join`` — latest-state-as-of-event-time, the temporal analog
  of goka's ctx.Join against a changing table.  Implemented with the
  union + last_value window technique: ONE shuffle on the key, one
  per-partition sort, no range explosion — scales to arbitrarily
  large sides (vs. merge_asof which needs pandas per group).
- ``salted_join`` — skew mitigation: replicate the small side S ways,
  salt the big side's key, join, drop salt.
- ``copartition`` — force identical hash partitioning across frames
  (goka copartition_strategy.go), so downstream per-key stages reuse
  one shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: Optional[Column] = None,
    tiebreak: Optional[str] = None,
    direction: str = "backward",
    _match_ts: Optional[str] = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row of the same ``on`` key with ``right_ts <= left_ts`` (backward
    as-of, the default) or — with ``direction="forward"`` — the
    EARLIEST right row with ``right_ts >= left_ts`` (the pandas
    ``merge_asof(direction=...)`` / kdb window-join pair).  Ties on
    right_ts resolved by ``tiebreak`` (largest wins) in both
    directions.  Same single-exchange union+window kernel either way:
    forward just flips the traversal order, it is NOT a second
    shuffle."""
    if direction == "nearest":
        # the pandas third direction: closest right row by |Δt|, an
        # exact-distance tie going to the BACKWARD match (documented;
        # pandas leaves it unspecified).  Composed from the two
        # directed passes — each keeps its match timestamp — so
        # nearest costs two window passes, not a new kernel.
        b = as_of_join(left, right, on, left_ts, right_ts, value_cols,
                       tolerance, tiebreak, "backward",
                       _match_ts="_b_ts")
        for c in value_cols:
            b = b.withColumnRenamed(f"asof_{c}", f"_b_{c}")
        f2 = as_of_join(b, right, on, left_ts, right_ts, value_cols,
                        tolerance, tiebreak, "forward",
                        _match_ts="_f_ts")
        lt = F.unix_micros(F.col(left_ts))
        bd = lt - F.unix_micros(F.col("_b_ts"))
        fd = F.unix_micros(F.col("_f_ts")) - lt
        use_b = (F.col("_b_ts").isNotNull()
                 & (F.col("_f_ts").isNull() | (bd <= fd)))
        out = f2
        for c in value_cols:
            out = out.withColumn(
                f"asof_{c}",
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"asof_{c}")))
        return out.drop("_b_ts", "_f_ts",
                        *[f"_b_{c}" for c in value_cols])
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, "
            f"got {direction!r}")
    l2 = left.withColumn("_ats", F.col(left_ts)).withColumn(
        "_tag", F.lit(1)).withColumn("_tb", F.lit(None).cast("long"))
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    ).withColumn("_tag", F.lit(0))
    both = l2.unionByName(r2, allowMissingColumns=True)
    # build rows (_tag=0) sort before probe rows at equal ts ⇒ a right
    # row at exactly left_ts is visible to that left row.  Forward
    # traverses ts DESC, so "last non-null seen" is the smallest
    # right_ts >= left_ts; _tb stays ASC so the largest tiebreak is
    # still the last (winning) row within a tied-ts run.
    ats = F.col("_ats").desc() if direction == "forward" \
        else F.col("_ats").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(ats, F.col("_tag").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = both
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}", F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w)
        )
    out = out.withColumn("_asof_ts", F.last(
        F.when(F.col("_tag") == 0, F.col("_ats")), ignorenulls=True).over(w))
    out = out.filter(F.col("_tag") == 1)
    if tolerance is not None:
        if direction == "forward":
            keep = F.col("_asof_ts") <= (
                F.col("_ats").cast("timestamp") + tolerance)
        else:
            keep = F.col("_asof_ts") >= (
                F.col("_ats").cast("timestamp") - tolerance)
        for c in value_cols:
            out = out.withColumn(f"asof_{c}", F.when(keep, F.col(f"asof_{c}")))
    if _match_ts is not None:
        # keep the matched right-row timestamp (nulled outside the
        # tolerance window, like the values)
        kept = F.col("_asof_ts")
        if tolerance is not None:
            kept = F.when(keep, kept)
        out = out.withColumn(_match_ts, kept)
    drop = ["_ats", "_tag", "_tb", "_asof_ts"] + [f"_v_{c}" for c in value_cols]
    return out.drop(*drop)


def salted_join(big: DataFrame, small: DataFrame, on: str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Skewed-key equi-join: salt the big side, explode the small side.

    AQE's skew-join handles moderate skew automatically; this is the
    explicit tool for pathological keys (one key ≫ a partition).
    """
    bs = big.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return bs.join(ss, on=[on, "_salt"], how=how).drop("_salt")


def copartition(frames: dict[str, DataFrame], num_partitions: int,
                key: str = "key") -> dict[str, DataFrame]:
    """Hash-partition every frame identically on ``key`` (goka's
    copartition invariant).  Spark guarantees same-hash ⇒ same
    partition id for equal partition counts."""
    return {n: df.repartition(num_partitions, key) for n, df in frames.items()}


def interval_bucket_join(points: DataFrame, intervals: DataFrame,
                         on: str, point_ts: str, start_ts: str,
                         end_ts: str, bucket: str = "30 minutes",
                         how: str = "inner") -> DataFrame:
    """Point-in-interval join WITHOUT a nested-loop range join.

    A bare ``p.ts BETWEEN i.start AND i.end`` condition (plus an
    equi-key) leaves Spark a sort-merge on the key with a per-key
    range scan — fine until one key is hot, fatal when there is no
    usable equi-key.  The scale-safe shape: quantize time into fixed
    buckets, EXPLODE each interval onto every bucket it covers, then
    equi-join on (key, bucket) and re-check the exact range.  Join
    cost becomes |points| + Σ interval_span/bucket — linear, shuffle
    on a composite key AQE can split — the same bucketize-then-
    equi-join discipline as the LSH similarity joins.

    ``bucket`` should be ≥ the typical interval span (one-a-few
    buckets per interval); intervals must satisfy start ≤ end.
    """
    qty, unit = bucket.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    width = int(qty) * mult * 1_000_000  # micros

    p = points.withColumn("_bk", F.floor(F.unix_micros(F.col(point_ts))
                                         / F.lit(width)))
    i = intervals.withColumn(
        "_bk",
        F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start_ts)) / F.lit(width)),
            F.floor(F.unix_micros(F.col(end_ts)) / F.lit(width)))))
    out = p.join(i, on=[on, "_bk"], how=how).filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts)))
    return out.drop("_bk")
