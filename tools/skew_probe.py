"""Skew probe: hot-key behavior of aggregation, join, and PyFold.

Builds a 1.6M-row events set where 50% of rows share user_id=0, then
measures:
- AggFold group-table fold (map-side combine should neutralize skew),
- shuffle join against a keyed table: AQE skew-split vs salted_join
  (broadcast disabled to force the shuffle path),
- PyFold on the hot key (the documented risk: one giant pandas group).

Appends results to tools/skew_results.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from goka_spark.session import get_session


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main():
    spark = get_session("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    n = 16_000_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            # 50% of traffic on key 0; rest uniform over 10k keys
            F.when(F.col("id") % 2 == 0, F.lit(0))
             .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000))).alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        )
        .repartition(32)
        .cache()
    )
    ev.count()
    users = spark.range(10_000).select(
        F.col("id").alias("u_id"), F.lit("seg").alias("segment")).cache()
    users.count()

    r = {}
    r["agg_hot_key"] = timed(
        ev.groupBy("user_id").agg(F.count("*").alias("c"),
                                  F.sum("value").alias("s")))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    r["join_aqe_skew"] = timed(
        ev.join(users, ev.user_id == users.u_id).groupBy("segment").count())

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    r["join_no_skew_handling"] = timed(
        ev.join(users, ev.user_id == users.u_id).groupBy("segment").count())

    from goka_spark.operators.joins import salted_join

    r["join_salted"] = timed(
        salted_join(ev.withColumnRenamed("user_id", "k"),
                    users.withColumnRenamed("u_id", "k"), on="k", salt=32)
        .groupBy("segment").count())

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(json.dumps(r))
    with open("/root/repo/tools/skew_results.json", "w") as fh:
        json.dump(r, fh, indent=1)


if __name__ == "__main__":
    main()
