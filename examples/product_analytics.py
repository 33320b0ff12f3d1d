"""The product-analytics layer in one walkthrough — the reports a
growth/engagement team reads every morning, each one an exact-integer
registry query with a DuckDB oracle:

  1. user_path_topk         — top user journeys (first five events)
  2. funnel_steps_timed     — signup → click → purchase, each step
                              within 24 h of the previous
  3. activation_delay_buckets — signup → first purchase latency via
                              the FORWARD as-of join
  4. retention_triangle     — the cohort-week × offset matrix
  5. stickiness_dau_mau     — DAU / trailing-30-day MAU
  6. max_drawdown           — per-user running-peak drawdown

plus the two streaming faces whose epoch partials merge EXACTLY:

  7. OhlcSink               — candles with carried (ts, id) order
                              keys (out-of-order epochs still merge
                              right)
  8. DrawdownSink           — cross-epoch drawdown from
                              (peak, min, mdd) partials
  9. GrowthAccountingSink   — weekly new/retained/resurrected/
                              churned states stitched across epochs
                              (== the batch growth_accounting table)

and three more batch reports: growth_accounting,
seasonal_anomalies (weekday-hour-adjusted spikes) and
event_cooccurrence_lift (behavior market-basket).

Run: python examples/product_analytics.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import get_session
from goka_spark.operators.windows import (DrawdownSink,
                                          GrowthAccountingSink, OhlcSink)
from goka_spark.queries import analytics as Q
from goka_spark.queries.base import load


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("product_analytics")
    spark.sparkContext.setLogLevel("ERROR")

    print("== top user journeys ==")
    Q.user_path_topk(spark, sf).show(5, truncate=False)

    print("== 24h-windowed funnel ==")
    Q.funnel_steps_timed(spark, sf).orderBy(F.desc("n_users")).show()

    print("== activation latency ==")
    Q.activation_delay_buckets(spark, sf).orderBy("bucket").show()

    print("== retention triangle ==")
    (Q.retention_triangle(spark, sf)
     .orderBy("cohort_week", "week_offset").show())

    print("== stickiness (first week) ==")
    Q.stickiness_dau_mau(spark, sf).orderBy("day").show(7)

    print("== worst drawdowns ==")
    (Q.max_drawdown(spark, sf)
     .orderBy(F.desc("max_drawdown_e2")).show(5))

    print("== engagement concentration (deciles + Gini) ==")
    Q.user_activity_deciles(spark, sf).orderBy("decile").show()
    Q.activity_gini(spark, sf).show()

    print("== RFM segments ==")
    Q.rfm_segments(spark, sf).orderBy(F.desc("n_users")).show()

    # -- streaming faces: feed epoch chunks, read back batch-exact --
    ev = load(spark, sf, "events")["events"]
    with tempfile.TemporaryDirectory() as tmp:
        ohlc = OhlcSink(f"{tmp}/ohlc")
        # deliberately out of time order: the carried order keys make
        # the open/close merge exact anyway
        for i, res in enumerate((1, 0, 2)):
            ohlc(ev.filter(F.col("event_id") % 3 == res), i)
        print("== live OHLC (merged across scrambled epochs) ==")
        ohlc.read(spark).orderBy("event_type", "window_start_us").show(5)

        dd = DrawdownSink(f"{tmp}/dd")
        row = ev.selectExpr(
            "percentile(unix_micros(ts), 0.5) AS mid").first()
        us = F.unix_micros("ts")
        dd(ev.filter(us <= int(row.mid)), 0)   # ordered epochs
        dd(ev.filter(us > int(row.mid)), 1)
        print("== live drawdown (cross-epoch peaks included) ==")
        dd.read(spark).orderBy(F.desc("max_drawdown_e2")).show(5)

        ga = GrowthAccountingSink(f"{tmp}/ga")
        ga(ev.filter(us <= int(row.mid)), 0)
        ga(ev.filter(us > int(row.mid)), 1)
        print("== live growth accounting (== batch B73 table) ==")
        ga.read(spark).orderBy("week").show()

    print("== weekly growth accounting (batch) ==")
    Q.growth_accounting(spark, sf).orderBy("week").show()

    print("== seasonally-adjusted anomalies (spikes only) ==")
    (Q.seasonal_anomalies(spark, sf)
     .filter("is_spike").orderBy(F.desc("cnt")).show(5))

    print("== behavior co-occurrence lift ==")
    (Q.event_cooccurrence_lift(spark, sf)
     .orderBy(F.desc("lift_e6")).show())


if __name__ == "__main__":
    main()
