"""B-block queries — event-time windows + relational analytics.

Windowed aggregations over ``events`` (the Structured-Streaming-shaped
workload) and TPC-H-style relational queries over the star schema
(the batch/OLAP workload).  Every computed column aliased identically
in Spark and DuckDB; timestamps emitted as epoch-micros longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from goka_spark.operators import windows as W
from goka_spark.operators.joins import as_of_join
from goka_spark.queries.base import load

#: Hard cap on the count-frequency frame the inequality kernels
#: (B58 deciles / B59 activity gini / B81 revenue gini) may feed
#: through their UNPARTITIONED cumulative window.  The frame is one
#: row per DISTINCT activity level (bounded by the max per-key count,
#: ≪ number of keys), so 4M rows is orders of magnitude above any
#: legitimate use — the guard exists so the kernel CANNOT silently be
#: reused on a high-cardinality value column where a single-partition
#: window would become the bottleneck (r9 verdict ask #4).
FREQ_WINDOW_BOUND = 1 << 22


def _guard_freq_window(df: DataFrame, order_col,
                       bound: int = FREQ_WINDOW_BOUND) -> DataFrame:
    """Fail loudly if ``df`` (a count-frequency frame about to enter a
    global cumulative window ordered by ``order_col``) exceeds
    ``bound`` rows.  Piggybacks a ``row_number`` on the SAME
    partition/order as the kernel's window — no extra exchange, scan
    or driver collect; ``assert_true`` raises mid-window the moment
    row ``bound + 1`` is produced."""
    rn = F.row_number().over(Window.orderBy(order_col))
    guard = F.assert_true(
        rn <= F.lit(bound),
        F.lit(f"count-frequency frame exceeds FREQ_WINDOW_BOUND "
              f"({bound}): this inequality kernel runs an "
              f"unpartitioned cumulative window and must only see "
              f"distinct-level-sized input"))
    return (df.withColumn("_fw_guard", guard)
            .filter(F.col("_fw_guard").isNull())
            .drop("_fw_guard"))


# -- windowed (B1-B3, B11-B12) ---------------------------------------

def tumbling_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    return W.tumbling(ev, "ts", "1 hour", ["event_type"], {
        "cnt": F.count("*"),
        "sum_value": F.round(F.sum("value"), 3),
    })


def hopping_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    return W.hopping(ev, "ts", "1 hour", "30 minutes", ["event_type"], {
        "cnt": F.count("*"),
    })


def session_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    out = W.session(ev.withColumn("key", F.col("user_id").cast("string")),
                    "ts", "30 minutes", ["key"], {"cnt": F.count("*")})
    return out


def running_total_per_user(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        F.col("user_id").cast("string").alias("key"),
        "event_id",
        F.round(F.sum("value").over(w), 3).alias("running_value"),
    )


def event_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Assign a session ordinal per user: a new session starts when the
    gap to the previous event exceeds 30 minutes (islands via lag)."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("_new", new_sess)
        .withColumn("session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(F.col("user_id").cast("string").alias("key"), "event_id",
                F.col("session_id").cast("long").alias("session_id"))
    )


# -- relational (B4-B8, B10, B14-B15) --------------------------------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1: scan-heavy aggregation; Catalyst pushes the shipdate
    filter into the parquet scan and does map-side partial agg."""
    li = load(spark, sf, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    t = load(spark, sf, "customer", "orders", "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-03-15"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
                "o_orderpriority", "revenue")
    )


def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5: 6-way star join; region/nation are broadcast dims."""
    t = load(spark, sf, "region", "nation", "customer", "supplier",
             "orders", "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter((F.col("r_name") == "ASIA")
                & (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .groupBy("n_name")
        .agg(F.round(rev, 2).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    t = load(spark, sf, "customer", "orders", "lineitem", "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") >= F.lit("1996-10-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def top_k_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 events by value within each event_type (rank-in-partition;
    at scale: per-partition top-k then merge, no global sort)."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "event_id", "value", F.col("rk").cast("long").alias("rk"))
    )


def distinct_users_per_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"))


def approx_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate distinct users per event type, served by the
    engine-portable HyperLogLog kernel (functions/dedup.py
    hll_registers/hll_estimate): md5-derived registers + the
    deterministic estimate formula reproduce bit-identically in
    DuckDB, so this is hash-verified where Spark's opaque builtin
    sketch could only ever be rows-only (r8 verdict ask #3).  Same
    one-shuffle shape as the builtin: partial register maxes map-side,
    256 registers per group reduce-side — the 100 TB cardinality
    path.  Builtin twin kept as approx_distinct_users_builtin."""
    from goka_spark.functions import dedup as D
    ev = load(spark, sf, "events")["events"]
    regs = D.hll_registers(ev, ["event_type"], "user_id")
    return D.hll_estimate(regs, ["event_type"]) \
        .select("event_type", F.col("hll_est").alias("approx_users"))


def approx_distinct_users_builtin(spark: SparkSession, sf: str) -> DataFrame:
    """Spark's builtin HLL++ sketch (rows-only by design: the sketch
    is engine-opaque, estimates differ across engines). Kept as the
    builtin-surface twin of approx_distinct_users, which serves the
    verified portable kernel."""
    ev = load(spark, sf, "events")["events"]
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))


def event_type_pivot(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")["events"]
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy(F.col("user_id").cast("string").alias("key"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("key", *[F.col(t).alias(f"n_{t}") for t in types])
    )


def as_of_join_q(spark: SparkSession, sf: str) -> DataFrame:
    """B13: for each purchase, the user's most recent click at-or-before
    the purchase time (goka: ctx.Join against evolving state, temporal)."""
    ev = load(spark, sf, "events")["events"]
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))
    out = as_of_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_id"], tiebreak="click_id",
    )
    return out.select(
        F.col("user_id").cast("string").alias("key"),
        "event_id",
        F.col("asof_click_id").alias("last_click_id"),
    )


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (adapted): trade volume between two nations by year."""
    t = load(spark, sf, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("c_nk"),
                            F.col("n_name").alias("cust_nation"))
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(rev, 2).alias("revenue"))
    )


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: promo revenue share over one month of shipments."""
    t = load(spark, sf, "lineitem", "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= F.lit("1996-09-01"))
                & (F.col("l_shipdate") < F.lit("1996-10-01")))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.sum(promo) * 100.0 / F.sum(disc), 4).alias("promo_revenue"))
    )


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a quantity threshold."""
    t = load(spark, sf, "customer", "orders", "lineitem")
    big = (
        t["lineitem"].groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
    )
    return (
        t["orders"].join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("_q"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty")
    )


def q19_discounted_brand(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (adapted to schema): branded parts in quantity bands."""
    t = load(spark, sf, "lineitem", "part")
    return (
        t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
             & F.col("l_quantity").between(1, 20))
            | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 30)
               & F.col("l_quantity").between(10, 30))
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence analytics: users whose first click precedes their last
    purchase (click->purchase funnel), with conversion lag."""
    ev = load(spark, sf, "events")["events"]
    per_user = (
        ev.groupBy(F.col("user_id").cast("string").alias("key"))
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("_fc"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("_lp"),
        )
    )
    return (
        per_user.filter(F.col("_fc").isNotNull() & F.col("_lp").isNotNull()
                        & (F.col("_fc") < F.col("_lp")))
        .select("key",
                ((F.unix_micros("_lp") - F.unix_micros("_fc")) / 1_000_000)
                .cast("long").alias("lag_s"))
    )


def user_retention_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; per cohort,
    distinct users and total active user-days."""
    ev = load(spark, sf, "events")["events"]
    first_day = F.date_format(F.min("ts"), "yyyy-MM-dd")
    per_user = ev.groupBy("user_id").agg(
        first_day.alias("cohort"),
        F.count_distinct(F.date_format("ts", "yyyy-MM-dd")).alias("_days"),
    )
    return per_user.groupBy("cohort").agg(
        F.count("*").alias("users"),
        F.sum("_days").alias("active_user_days"),
    )


def event_dedup_window(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-style dedup: drop events repeating the same (user, type)
    within 5 minutes of the previous kept occurrence's arrival — the
    batch analog of dropDuplicatesWithinWatermark (lag-based)."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("_gap", gap)
        .filter(F.col("_gap").isNull() | (F.col("_gap") > 5 * 60 * 1_000_000))
        .select(F.col("user_id").cast("string").alias("key"), "event_id",
                "event_type")
    )


def q22_no_order_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers with NO orders in
    the first half of 1995 (anti join), grouped by nationkey."""
    t = load(spark, sf, "customer", "orders")
    recent = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01")))
    return (
        t["customer"].filter(F.col("c_acctbal") > 0)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )


def above_avg_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-subquery shape: customers above the global average
    balance (the subquery is a broadcast single-row cross join)."""
    cust = load(spark, sf, "customer")["customer"]
    avg_bal = cust.agg(F.avg("c_acctbal").alias("_avg"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


def semi_join_active_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Semi join: parts that appear in at least one 1996 shipment."""
    t = load(spark, sf, "part", "lineitem")
    shipped = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01")))
    return (
        t["part"].join(shipped, F.col("p_partkey") == F.col("l_partkey"),
                       "left_semi")
        .select("p_partkey", "p_brand")
    )


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (adapted): NATION_3's share of ASIA order revenue for
    Brand#1 parts, by order year."""
    t = load(spark, sf, "part", "supplier", "lineitem", "orders",
             "customer", "nation", "region")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n_s = t["nation"].select(F.col("n_nationkey").alias("snk"),
                             F.col("n_name").alias("supp_nation"))
    n_c = t["nation"].select(F.col("n_nationkey").alias("cnk"),
                             F.col("n_regionkey").alias("crk"))
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_brand") == "Brand#1"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(t["region"]).filter(F.col("r_name") == "ASIA"),
              F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                  .otherwise(F.lit(0.0))) / F.sum(vol), 4).alias("mkt_share"))
    )


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in one quarter."""
    t = load(spark, sf, "supplier", "lineitem")
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max"))
    return (
        t["supplier"].join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_max"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17: revenue loss from small-quantity orders of Brand#2
    parts (correlated avg subquery → per-part broadcast join)."""
    t = load(spark, sf, "part", "lineitem")
    avg_q = (t["lineitem"].groupBy(F.col("l_partkey").alias("apk"))
             .agg((F.avg("l_quantity") * 0.5).alias("_half_avg")))
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_brand") == "Brand#2"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("apk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: distribution of orders per customer, including
    zero-order customers (left outer join → count → histogram —
    two hash-aggregates, both map-side combinable)."""
    t = load(spark, sf, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (adapted: no commit/receipt dates in this schema —
    "late" is a lineitem shipped >60 days after the order date):
    order counts per priority for orders with at least one late
    lineitem.  EXISTS → left-semi join, the scan filters pushed down."""
    t = load(spark, sf, "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    late = t["lineitem"].select(
        F.col("l_orderkey"), F.col("l_shipdate"))
    return (
        orders.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate").cast("date")
               > F.date_add(F.col("o_orderdate").cast("date"), 60)),
            "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q12_ship_delay_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (adapted: buckets on ship delay instead of the absent
    ship modes): per delay bucket, how many high- vs low-priority
    orders shipped there — one aggregate over a join, conditional
    counts stay in codegen."""
    t = load(spark, sf, "orders", "lineitem")
    delay = F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date"))
    bucket = (F.when(delay <= 30, "fast")
              .when(delay <= 90, "normal")
              .otherwise("slow"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(F.count_if(high).alias("high_line_count"),
             F.count_if(~high).alias("low_line_count"))
    )


def q9_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp/supplycost in this schema —
    profit is discounted revenue): profit per supplier nation per
    order year for red parts.  The filtered part dim and the tiny
    nation dim broadcast by hint; supplier is SF-proportional, so its
    join strategy is left to AQE (broadcast at test SFs, shuffle at
    100 TB);
    the only big shuffle is the final (nation, year) aggregate."""
    t = load(spark, sf, "part", "supplier", "lineitem", "orders", "nation")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").contains("red"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"],
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("profit"))
    )


def q16_supplier_count_by_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (adapted: the part↔supplier relation comes from
    observed lineitems instead of the absent partsupp; "complaint"
    suppliers are the negative-balance ones): distinct supplier count
    per (brand, type, size) — NOT IN → broadcast anti join on the
    tiny blacklist, distinct-count on the deduped pair relation."""
    t = load(spark, sf, "part", "supplier", "lineitem")
    pairs = (t["lineitem"].select("l_partkey", "l_suppkey").distinct())
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs
        .join(F.broadcast(bad),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(t["part"].filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23))),
            F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (adapted: part value = shipped revenue instead of
    stock value): parts whose revenue from NATION_1 suppliers exceeds
    0.1% of that nation's total — scalar subquery → one extra tiny
    aggregate, broadcast back as a cross join of a single row."""
    t = load(spark, sf, "supplier", "lineitem", "nation")
    nat = (t["supplier"]
           .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_1")),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey"))
    li = (t["lineitem"]
          .join(F.broadcast(nat), F.col("l_suppkey") == F.col("s_suppkey"))
          .withColumn("_val", F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    per_part = li.groupBy("l_partkey").agg(F.sum("_val").alias("_pv"))
    total = per_part.agg((F.sum("_pv") * 0.001).alias("_threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_pv") > F.col("_threshold"))
        .select("l_partkey", F.round("_pv", 2).alias("part_value"))
    )


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (adapted: "cost" is the supplier's average unit sell
    price observed in lineitems, partsupp being absent): for each
    size-15 part, the supplier(s) offering the minimum unit price.
    Correlated min subquery → window min over the part key (no
    second join against the aggregate)."""
    t = load(spark, sf, "part", "supplier", "lineitem")
    # exact-integer arithmetic end to end: float SUM order differs
    # between engines, and quotients landing EXACTLY on a 4-dp
    # half-way point (sf0.1: 162551 cents / 40 qty = 40.63775) round
    # differently — Spark rounds the decimal string, DuckDB the
    # binary double.  Sum exact cents/quantities, apply half-up in
    # integer algebra ((200c + q) DIV 2q = round(100c/q)), and only
    # THEN divide by the 1e4 scale — both engines see identical
    # integers and perform the identical final division.
    unit = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_size") == 15)),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                   .cast("long")).alias("_cents"),
             F.sum(F.col("l_quantity").cast("long")).alias("_qty"))
        .select("p_partkey", "l_suppkey",
                (F.expr("(200 * _cents + _qty) DIV (2 * _qty)")
                 / 10000.0).alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        unit.withColumn("_min", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("_min"))
        .join(t["supplier"],
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "unit_price")
    )


def q20_excess_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (adapted: availqty absent — a supplier has "excess
    share" when it shipped >20% of a part's total quantity): names of
    such suppliers in NATION_1.  Share = windowed total per part; the
    supplier join is AQE-chosen (the dim is SF-proportional — forced
    broadcast would OOM at 100 TB); output distinct supplier names."""
    t = load(spark, sf, "supplier", "lineitem", "nation")
    per = (t["lineitem"].groupBy("l_partkey", "l_suppkey")
           .agg(F.sum("l_quantity").alias("_q")))
    w = Window.partitionBy("l_partkey")
    heavy = (per.withColumn("_tot", F.sum("_q").over(w))
             .filter(F.col("_q") > 0.2 * F.col("_tot"))
             .select("l_suppkey").distinct())
    return (
        heavy
        .join(t["supplier"],
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (adapted: commit/receipt dates absent — "late" is a
    lineitem shipped >60 days after the order date, as in Q4): per
    NATION_9 supplier, how many finished multi-supplier orders it was
    the SOLE late supplier of (goka parity: the same per-key blame
    aggregation an ops pipeline runs; reference collectors.go-style
    keyed counters).

    Scale shape: the spec's two correlated EXISTS self-joins on
    lineitem are re-expressed as ONE per-order aggregate (distinct
    suppliers, distinct late suppliers) joined back to the late
    lineitems — both sides shuffle once on l_orderkey and AQE
    co-partitions them; nation broadcasts by hint, the SF-proportional
    supplier dim by AQE's choice.  At 100 TB
    this avoids re-scanning lineitem twice per EXISTS."""
    t = load(spark, sf, "orders", "lineitem", "supplier", "nation")
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate")
    ll = (t["lineitem"]
          .join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
          .select(
              "l_orderkey", "l_suppkey",
              (F.col("l_shipdate").cast("date")
               > F.date_add(F.col("o_orderdate").cast("date"), 60))
              .alias("_late")))
    agg = (ll.groupBy("l_orderkey")
           .agg(F.countDistinct("l_suppkey").alias("_n_supp"),
                F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey")))
                 .alias("_n_late")))
    late1 = (ll.filter(F.col("_late"))
             .select("l_orderkey", "l_suppkey").distinct())
    return (
        late1
        .join(agg, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .join(t["supplier"],
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_9")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def event_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical subtotal aggregate via ROLLUP(event_type, day) —
    Catalyst's Expand operator computes all grouping sets in ONE scan
    + one hash-aggregate (no per-level re-scan); grouping_id
    disambiguates subtotal rows for the consumer.  The declarative
    twin of a goka processor maintaining per-(type, day), per-type and
    global counters in one pass."""
    ev = load(spark, sf, "events")["events"]
    return (
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        .rollup("event_type", "day")
        .agg(F.count("*").alias("cnt"),
             F.round(F.sum("value"), 3).alias("sum_value"),
             F.grouping_id().cast("long").alias("gid"))
    )


def event_interarrival(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user inter-arrival stats from lag() gaps.  The average is
    computed as an INTEGER micros sum divided at the end — integer
    partial aggregation is order-independent, so the distributed
    result is bit-stable (a float sum's partial ordering is not)."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("_gap", gap)
        .filter(F.col("_gap").isNotNull())
        # group on the RAW window partition key: the window's exchange
        # already clusters by user_id, so the aggregate needs no second
        # exchange (grouping on cast(user_id) would break the reuse)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_gaps"),
             F.max("_gap").alias("max_gap_us"),
             F.round(F.sum("_gap") / F.count("*") / 1e6, 3)
              .alias("avg_gap_s"))
        .select(F.col("user_id").cast("string").alias("key"),
                "n_gaps", "max_gap_us", "avg_gap_s")
    )


def value_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quantiles per event type (percentile with
    the standard (n-1)p interpolation — same definition as SQL
    quantile_cont).  At 100 TB swap in approx_percentile (t-digest
    sketch, map-side combinable) — kept exact here because the oracle
    is exact."""
    ev = load(spark, sf, "events")["events"]
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
             F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
             F.count("*").alias("cnt"))
    )


def purchase_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval attribution: every click landing in the 30
    minutes before a same-user purchase.  Runs through
    ``interval_bucket_join`` — interval exploded onto time buckets,
    equi-join on (user, bucket), exact range re-check — never a
    nested-loop range join (plan-shape-tested)."""
    from goka_spark.operators.joins import interval_bucket_join

    ev = load(spark, sf, "events")["events"]
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         (F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
                         .alias("w_start"),
                         F.col("ts").alias("w_end")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    out = interval_bucket_join(clicks, purchases, on="user_id",
                               point_ts="click_ts", start_ts="w_start",
                               end_ts="w_end", bucket="30 minutes")
    return out.select("purchase_id", "click_id")


def value_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles (W.histogram_quantiles):
    256 equi-width bins over [0, 512) — exact integer counters that
    shards merge cell-wise, quantile = first bin reaching ceil(q·n)
    (inverted CDF, integer-exact).  The deterministic bounded-memory
    twin of value_quantiles' exact percentiles; error <= bin width 2.
    """
    from goka_spark.operators import windows as W

    ev = load(spark, sf, "events")["events"]
    return W.histogram_quantiles(ev, "value", ["event_type"],
                                 lo=0.0, hi=512.0, n_bins=256)


def key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Hot-key diagnostic — the measurement that decides whether a
    user-keyed shuffle needs salting BEFORE the straggler appears
    (the measurement face of tools/skew_probe + the salted_join
    tool): the top-20 user_ids by event count, each with its share
    of all rows (integer micro-units) and its multiple of the mean
    per-key load (per-factor double casts in fixed association — the
    PMI discipline, since cnt·n_keys overflows long at corpus scale).

    Scale shape: one user-keyed hash-agg with map-side combine +
    TakeOrdered(20) — never a global sort; scalar totals ride one
    broadcast one-row cross join; the rank window is bounded to the
    20 collected rows."""
    from pyspark.sql.window import Window

    ev = load(spark, sf, "events")["events"]
    cnt = (ev.groupBy("user_id")
           .agg(F.count("*").cast("long").alias("cnt")))
    tot = cnt.agg(F.sum("cnt").cast("long").alias("_tot"),
                  F.count("*").cast("long").alias("_nk"))
    top = (cnt.orderBy(F.col("cnt").desc(), "user_id").limit(20)
           .crossJoin(F.broadcast(tot)))
    rnk = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), "user_id")).cast("long")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return top.select(
        rnk.alias("rank"), "user_id", "cnt",
        F.expr("cnt * 1000000L DIV _tot").alias("share_e6"),
        F.floor(d("cnt") * d("_nk") / d("_tot") * 1000000)
         .cast("long").alias("x_mean_e6"))


def event_volume_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly volume spike detection — the pipeline-health monitor
    every ingest dashboard carries: per event type, hourly counts
    flagged when they sit more than 3σ above that type's mean hourly
    volume.  The z-test is EXACT integer algebra (no float mean/std
    to drift between engines): with d = c·n − Σc (the deviation
    scaled by n buckets), spike ⟺ d > 0 ∧ d²·n > 9·(n·Σc² − (Σc)²)
    — the squared 3σ inequality cleared of denominators.  Bounds:
    exact while c·n < ~3·10⁹ per type (hourly counts × bucket count)
    — true for any per-hour monitoring window; shard the window if
    a type exceeds it.

    Scale shape: one (type, hour) hash-agg with map-side combine,
    one types-sized moment aggregate, one broadcast join back —
    never a window over the bucket stream."""
    ev = load(spark, sf, "events")["events"]
    cnt = (ev.groupBy("event_type",
                      F.date_trunc("hour", "ts").alias("_h"))
           .agg(F.count("*").cast("long").alias("cnt")))
    mom = (cnt.groupBy("event_type")
           .agg(F.count("*").cast("long").alias("_n"),
                F.sum("cnt").cast("long").alias("_s"),
                F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                .alias("_s2")))
    j = cnt.join(F.broadcast(mom), "event_type")
    d = F.col("cnt") * F.col("_n") - F.col("_s")
    var_n3 = F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s")
    return j.select(
        "event_type", F.unix_micros("_h").alias("hour_us"), "cnt",
        F.expr("_s * 100L DIV _n").alias("mean_e2"),
        ((d > 0) & (d * d * F.col("_n") > 9 * var_n3)).alias("is_spike"))


def volume_anomalies_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly volume spikes by MEDIAN/MAD — the robust twin of B46's
    mean/3σ monitor: a handful of huge hours poisons a mean baseline
    (the spike inflates the very σ that should flag it), while the
    median and the median absolute deviation ignore them.  Exact
    integer throughout: the LOWER median (k-th smallest,
    k = (n+1) DIV 2 — no midpoint averaging to disagree on) via a
    row_number over each type's hourly counts, MAD the same over
    |c − med|, spike ⟺ (c − med)·10000 > 44478·mad ∧ c > med
    (3·1.4826 ≈ 4.4478 scaled to e4).  Two tiny windows over the
    (type, hour) aggregate + a broadcast join — the bucket table is
    hours-sized, never the event stream."""
    ev = load(spark, sf, "events")["events"]
    cnt = (ev.groupBy("event_type",
                      F.date_trunc("hour", "ts").alias("_h"))
           .agg(F.count("*").cast("long").alias("cnt")))
    wk = Window.partitionBy("event_type").orderBy("cnt", "_h")
    ranked = (cnt
              .withColumn("_rn", F.row_number().over(wk))
              .withColumn("_n", F.count("*").over(
                  Window.partitionBy("event_type"))))
    med = (ranked.filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
           .select("event_type", F.col("cnt").alias("med")))
    dev = (cnt.join(F.broadcast(med), "event_type")
           .withColumn("_dev", F.abs(F.col("cnt") - F.col("med"))))
    wd = Window.partitionBy("event_type").orderBy("_dev", "_h")
    mad = (dev.withColumn("_rn", F.row_number().over(wd))
           .withColumn("_n", F.count("*").over(
               Window.partitionBy("event_type")))
           .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
           .select("event_type", F.col("_dev").alias("mad")))
    j = dev.join(F.broadcast(mad), "event_type")
    spike = ((F.col("cnt") > F.col("med"))
             & ((F.col("cnt") - F.col("med")) * 10000
                > 44478 * F.col("mad")))
    return j.select("event_type", F.unix_micros("_h").alias("hour_us"),
                    "cnt", "med", "mad", spike.alias("is_spike"))


def event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: for
    every (event_type → next_event_type) pair, the occurrence count
    and the row-conditional probability in exact integer micro-units
    (cnt·1e6 DIV from-type total).  The session-flow diagnostic
    behind funnel design — which step follows which, and how often.

    Scale shape: one exchange on user_id for the lead window (order
    ts, event_id — a total order, so any engine derives the same
    successor), then a (type, type)-keyed hash-agg with map-side
    combine; the per-from-type totals join is a types-sized frame."""
    from goka_spark.operators.windows import event_transition_counts

    ev = load(spark, sf, "events")["events"]
    # literally the TransitionSink kernel (same (ts, event_id) total
    # order on ties — stream ≡ batch by shared code, ADVICE r7)
    cnt = event_transition_counts(ev, "user_id", "ts", "event_type",
                                  id_col="event_id")
    tot = cnt.groupBy("event_type").agg(F.sum("cnt").alias("_tot"))
    return (cnt.join(tot, "event_type")
            .select("event_type", "next_event_type",
                    F.col("cnt").cast("long"),
                    F.expr("cnt * 1000000L DIV _tot").cast("long")
                    .alias("prob_e6")))


QUERIES = {
    "tumbling_window_agg": tumbling_window_agg,
    "event_transitions": event_transitions,
    "purchase_click_attribution": purchase_click_attribution,
    "hopping_window_agg": hopping_window_agg,
    "session_window_agg": session_window_agg,
    "running_total_per_user": running_total_per_user,
    "event_sessionize": event_sessionize,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "top_k_per_group": top_k_per_group,
    "distinct_users_per_type": distinct_users_per_type,
    "approx_distinct_users": approx_distinct_users,
    "approx_distinct_users_builtin": approx_distinct_users_builtin,
    "event_type_pivot": event_type_pivot,
    "as_of_join": as_of_join_q,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_brand": q19_discounted_brand,
    "funnel_conversion": funnel_conversion,
    "user_retention_cohort": user_retention_cohort,
    "event_dedup_window": event_dedup_window,
    "q22_no_order_customers": q22_no_order_customers,
    "above_avg_balance": above_avg_balance,
    "semi_join_active_parts": semi_join_active_parts,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q4_order_priority": q4_order_priority,
    "q12_ship_delay_buckets": q12_ship_delay_buckets,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q16_supplier_count_by_part": q16_supplier_count_by_part,
    "q11_important_parts": q11_important_parts,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "event_rollup": event_rollup,
    "event_interarrival": event_interarrival,
    "value_quantiles": value_quantiles,
    "value_histogram_quantiles": value_histogram_quantiles,
    "key_skew_report": key_skew_report,
    "event_volume_anomalies": event_volume_anomalies,
}

ORACLES = {
    "tumbling_window_agg": """
        SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
               event_type, COUNT(*) AS cnt, ROUND(SUM(value), 3) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "hopping_window_agg": """
        SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)
                        - off * INTERVAL '30 minutes') AS window_start_us,
               event_type, COUNT(*) AS cnt
        FROM events CROSS JOIN (VALUES (0), (1)) AS hops(off)
        GROUP BY 1, 2
    """,
    "session_window_agg": """
        WITH marked AS (
          SELECT CAST(user_id AS VARCHAR) AS key, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL '30 minutes' OR
                           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
        ), sess AS (
          SELECT key, ts,
                 SUM(new_sess) OVER (PARTITION BY key ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT key, COUNT(*) AS cnt, epoch_us(MIN(ts)) AS session_start_us
        FROM sess GROUP BY key, sid
    """,
    "running_total_per_user": """
        SELECT CAST(user_id AS VARCHAR) AS key, event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 3) AS running_value
        FROM events
    """,
    "event_sessionize": """
        WITH marked AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL '30 minutes' OR
                           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
        )
        SELECT CAST(user_id AS VARCHAR) AS key, event_id,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marked
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
               o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) DESC, o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer, nation
        WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) DESC, c_custkey
        LIMIT 20
    """,
    "top_k_per_group": """
        SELECT event_type, event_id, value, rk FROM (
          SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY value DESC, event_id) AS rk
          FROM events
        ) WHERE rk <= 3
    """,
    "distinct_users_per_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS users
        FROM events GROUP BY event_type
    """,
    # approx_distinct_users: portable-HLL replay (same register/
    # estimate algebra as the hll_distinct_users twin in llmdata.py);
    # approx_distinct_users_builtin stays rows-only (opaque sketch)
    "approx_distinct_users": """
        WITH h AS (
          SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
        ), rv AS (
          SELECT event_type,
                 CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS reg,
                 CASE WHEN CAST(('0x' || substr(hx, 3, 12)) AS BIGINT) > 0
                      THEN 49 - length(bin(
                             CAST(('0x' || substr(hx, 3, 12)) AS BIGINT)))
                      ELSE 49 END AS val
          FROM h
        ), regs AS (
          SELECT event_type, reg, MAX(val) AS r
          FROM rv GROUP BY event_type, reg
        ), per AS (
          SELECT event_type,
                 CAST(SUM(CAST(1 AS BIGINT) << (49 - r))
                      + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 49)
                      AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 49 AS DOUBLE)
                   AS s,
                 CAST(256 - COUNT(*) AS DOUBLE) AS zeros
          FROM regs GROUP BY event_type
        )
        SELECT event_type,
               CASE WHEN (0.7213 / (1 + 1.079/256)) * 256 * 256 / s
                         <= 2.5 * 256 AND zeros > 0
                    THEN ROUND(256.0 * ln(256.0 / zeros), 4)
                    ELSE ROUND((0.7213 / (1 + 1.079/256)) * 256 * 256 / s, 4)
               END AS approx_users
        FROM per
    """,
    "event_type_pivot": """
        SELECT CAST(user_id AS VARCHAR) AS key,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'view') AS n_view,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (event_type = 'error') AS n_error
        FROM events GROUP BY user_id
    """,
    "as_of_join": """
        SELECT CAST(p.user_id AS VARCHAR) AS key, p.event_id, c.last_click_id
        FROM events p
        LEFT JOIN LATERAL (
          SELECT event_id AS last_click_id FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        ) c ON true
        WHERE p.event_type = 'purchase'
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, supplier, customer, nation n1, nation n2
        WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "q14_promo_revenue": """
        SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
               * 100.0 / SUM(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey,
               ROUND(o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "q19_discounted_brand": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size <= 30 AND l_quantity BETWEEN 10 AND 30))
    """,
    "funnel_conversion": """
        SELECT key, CAST(epoch_us(lp) - epoch_us(fc) AS BIGINT) // 1000000 AS lag_s
        FROM (
          SELECT CAST(user_id AS VARCHAR) AS key,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS fc,
                 MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS lp
          FROM events GROUP BY user_id
        ) WHERE fc IS NOT NULL AND lp IS NOT NULL AND fc < lp
    """,
    "user_retention_cohort": """
        SELECT cohort, COUNT(*) AS users,
               CAST(SUM(days) AS BIGINT) AS active_user_days
        FROM (
          SELECT strftime(MIN(ts), '%Y-%m-%d') AS cohort,
                 COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS days
          FROM events GROUP BY user_id
        ) GROUP BY cohort
    """,
    "event_dedup_window": """
        SELECT key, event_id, event_type FROM (
          SELECT CAST(user_id AS VARCHAR) AS key, event_id, event_type,
                 epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
          FROM events
        ) WHERE gap IS NULL OR gap > 5 * 60 * 1000000
    """,
    "q22_no_order_customers": """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > 0
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1995-01-01'
                          AND o_orderdate < TIMESTAMP '1995-07-01')
        GROUP BY c_nationkey
    """,
    "above_avg_balance": """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    "semi_join_active_parts": """
        SELECT p_partkey, p_brand FROM part
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_partkey = p_partkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01')
    """,
}

ORACLES["q8_market_share"] = """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM lineitem, part, supplier, orders, customer,
         nation n1, nation n2, region
    WHERE l_partkey = p_partkey AND p_brand = 'Brand#1'
      AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey AND c_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND s_nationkey = n1.n_nationkey
    GROUP BY 1
"""
ORACLES["q15_top_supplier"] = """
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""
ORACLES["q17_small_quantity"] = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#2'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
"""

ORACLES["q13_order_count_distribution"] = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) GROUP BY c_count
"""

ORACLES["q4_order_priority"] = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate::DATE > o.o_orderdate::DATE + 60)
    GROUP BY o_orderpriority
"""

ORACLES["q12_ship_delay_buckets"] = """
    SELECT CASE
             WHEN datediff('day', o_orderdate::DATE, l_shipdate::DATE) <= 30
               THEN 'fast'
             WHEN datediff('day', o_orderdate::DATE, l_shipdate::DATE) <= 90
               THEN 'normal'
             ELSE 'slow'
           END AS delay_bucket,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""

ORACLES["q9_profit_by_nation_year"] = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
"""

ORACLES["q16_supplier_count_by_part"] = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 23)
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""

ORACLES["q11_important_parts"] = """
    WITH li AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1')
    ), pp AS (SELECT l_partkey, SUM(val) AS pv FROM li GROUP BY l_partkey)
    SELECT l_partkey, ROUND(pv, 2) AS part_value
    FROM pp WHERE pv > (SELECT SUM(pv) * 0.001 FROM pp)
"""

ORACLES["q2_min_cost_supplier"] = """
    WITH sums AS (
      SELECT p_partkey, l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size = 15
      GROUP BY p_partkey, l_suppkey
    ), unit AS (
      SELECT p_partkey, l_suppkey,
             CAST((200 * c + q) // (2 * q) AS BIGINT) / 10000.0
               AS unit_price
      FROM sums
    )
    SELECT p_partkey, s_name, unit_price
    FROM (SELECT *, MIN(unit_price) OVER (PARTITION BY p_partkey) AS m
          FROM unit)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE unit_price = m
"""

ORACLES["q20_excess_shippers"] = """
    WITH per AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ), heavy AS (
      SELECT DISTINCT l_suppkey
      FROM (SELECT *, SUM(q) OVER (PARTITION BY l_partkey) AS tot FROM per)
      WHERE q > 0.2 * tot
    )
    SELECT s_suppkey, s_name, n_name
    FROM heavy JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
"""

ORACLES["q21_waiting_suppliers"] = """
    WITH fo AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ), ll AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_shipdate AS DATE)
               > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS is_late
      FROM lineitem JOIN fo ON l_orderkey = o_orderkey
    ), agg AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM ll GROUP BY l_orderkey
    ), late1 AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM ll WHERE is_late
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late1
    JOIN agg USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_supp > 1 AND n_late = 1 AND n_name = 'NATION_9'
    GROUP BY s_name
"""

ORACLES["event_rollup"] = """
    SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS cnt, ROUND(SUM(value), 3) AS sum_value,
           CAST(GROUPING(event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
                AS BIGINT) AS gid
    FROM events
    GROUP BY ROLLUP(event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
"""

ORACLES["event_interarrival"] = """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT CAST(user_id AS VARCHAR) AS key,
           COUNT(*) AS n_gaps,
           CAST(MAX(gap) AS BIGINT) AS max_gap_us,
           ROUND(CAST(SUM(gap) AS BIGINT) / COUNT(*) / 1e6, 3) AS avg_gap_s
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
"""

ORACLES["value_quantiles"] = """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
"""

ORACLES["purchase_click_attribution"] = """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


ORACLES["value_histogram_quantiles"] = """
    WITH b AS (
      SELECT event_type,
             CAST(LEAST(GREATEST(FLOOR(value / 2.0), 0), 255) AS INT)
               AS bin,
             COUNT(*) AS c
      FROM events GROUP BY event_type, bin
    ), cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type,
           MIN(CASE WHEN cum >= CEIL(n * 0.5) THEN bin * 2.0 END) AS p50,
           MIN(CASE WHEN cum >= CEIL(n * 0.9) THEN bin * 2.0 END) AS p90
    FROM cum GROUP BY event_type
"""

ORACLES["event_volume_anomalies"] = """
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, h
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      FROM c GROUP BY event_type
    )
    SELECT c.event_type, epoch_us(c.h) AS hour_us, c.cnt,
           CAST(s * 100 // n AS BIGINT) AS mean_e2,
           (c.cnt * n - s) > 0
             AND (c.cnt * n - s) * (c.cnt * n - s) * n
                 > 9 * (n * s2 - s * s) AS is_spike
    FROM c JOIN m ON m.event_type = c.event_type
"""

ORACLES["key_skew_report"] = """
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    t AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS nk
      FROM c
    ),
    top AS (
      SELECT user_id, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id)
                  AS BIGINT) AS rank
      FROM c ORDER BY cnt DESC, user_id LIMIT 20
    )
    SELECT rank, user_id, cnt,
           CAST(cnt * 1000000 // tot AS BIGINT) AS share_e6,
           CAST(FLOOR(CAST(cnt AS DOUBLE) * CAST(nk AS DOUBLE)
                      / CAST(tot AS DOUBLE) * 1000000) AS BIGINT)
             AS x_mean_e6
    FROM top CROSS JOIN t
"""

ORACLES["event_transitions"] = """
    WITH nx AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
               AS next_event_type
      FROM events
    ), c AS (
      SELECT event_type, next_event_type, COUNT(*) AS cnt
      FROM nx WHERE next_event_type IS NOT NULL
      GROUP BY event_type, next_event_type
    ), t AS (
      SELECT event_type, SUM(cnt) AS tot FROM c GROUP BY event_type
    )
    SELECT c.event_type, c.next_event_type,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // tot AS BIGINT) AS prob_e6
    FROM c JOIN t USING (event_type)
"""


def ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC candlestick rollup per (event_type, 1-hour window) — the
    classic time-series bar aggregation (open/close by deterministic
    (ts, event_id) order, high/low, volume).  One windowed hash-agg
    with map-side combine; open/close via max_by/min_by on a struct so
    ties break on event_id in both engines.  value integerized at e2
    (the data's native precision) so every output is an exact
    integer.  Serves W.ohlc_partials — the mergeable kernel the
    streaming OhlcSink shares — with the carried order keys
    projected away."""
    ev = load(spark, sf, "events")["events"]
    return (W.ohlc_partials(ev)
            .select("event_type", "open_e2", "high_e2", "low_e2",
                    "close_e2", "volume", "window_start_us"))


def time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-WEIGHTED average value per user (the TimescaleDB
    time_weight('LOCF') shape): each observation holds until the next
    one, so the mean weights each value by its holding interval —
    what a plain AVG gets wrong whenever sampling is irregular
    (exactly the events table's shape).  Exact integers end to end:
    per-step weight = Δt in microseconds (long), value integerized at
    e2, twa_e2 = Σ(v_e2·Δt_us) DIV ΣΔt_us.  Per-user lead window
    (bounded by the user's own events) + one hash-agg; users with one
    event have no held interval and report their value directly."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = (ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_e2"))
        .withColumn("_nxt", F.lead(F.unix_micros(F.col("ts"))).over(w))
        .withColumn("_dt", F.col("_nxt") - F.unix_micros(F.col("ts"))))
    # ONE window + ONE agg, no self-join: the held-interval sums and
    # the last observation come out of the same groupBy (max_by on the
    # deterministic (ts, event_id) order)
    return (stepped.groupBy("user_id")
            .agg(F.count("*").alias("_n"),
                 F.sum(F.when(F.col("_dt").isNotNull(),
                              F.col("v_e2") * F.col("_dt"))).alias("_num"),
                 F.sum("_dt").alias("_den"),
                 F.max_by("v_e2", F.struct("ts", "event_id"))
                 .alias("_last"))
            .select(F.col("user_id").cast("string").alias("key"),
                    F.col("_n").cast("long").alias("n_events"),
                    F.when(F.col("_den").isNotNull(),
                           F.expr("_num DIV _den"))
                     .otherwise(F.col("_last")).cast("long")
                    .alias("twa_e2")))


QUERIES["ohlc_bars"] = ohlc_bars
QUERIES["time_weighted_avg"] = time_weighted_avg

ORACLES["ohlc_bars"] = """
    WITH v AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS w,
             ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_e2
      FROM events
    ), ranked AS (
      SELECT event_type, w, v_e2,
             ROW_NUMBER() OVER (PARTITION BY event_type, w
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, w
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM v
    )
    SELECT event_type,
           MAX(CASE WHEN rn_a = 1 THEN v_e2 END) AS open_e2,
           MAX(v_e2) AS high_e2,
           MIN(v_e2) AS low_e2,
           MAX(CASE WHEN rn_z = 1 THEN v_e2 END) AS close_e2,
           COUNT(*) AS volume,
           epoch_us(w) AS window_start_us
    FROM ranked GROUP BY event_type, w
"""

ORACLES["time_weighted_avg"] = """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CAST(ROUND(value * 100) AS BIGINT) AS v_e2,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    ), held AS (
      SELECT user_id, SUM(v_e2 * (nxt - t_us)) AS num,
             SUM(nxt - t_us) AS den, COUNT(*) AS steps
      FROM s WHERE nxt IS NOT NULL GROUP BY user_id
    ), lastv AS (
      SELECT user_id, v_e2 AS lastv FROM s WHERE nxt IS NULL
    )
    SELECT CAST(l.user_id AS VARCHAR) AS key,
           CAST(COALESCE(h.steps, 0) + 1 AS BIGINT) AS n_events,
           CAST(CASE WHEN h.den IS NOT NULL THEN h.num // h.den
                ELSE l.lastv END AS BIGINT) AS twa_e2
    FROM lastv l LEFT JOIN held h USING (user_id)
"""


def conversion_delay_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Click→purchase CONVERSION-DELAY distribution — the funnel-
    latency report next to B20's conversion rate and B41's
    attribution pairs: for each purchase, the delay since the same
    user's LATEST preceding click (the as-of union+window kernel, one
    hash exchange), bucketed into fixed latency bands on the exact
    integer delay in seconds.  Purchases with no prior click count in
    'never'.  One as-of pass + a bands-sized hash-agg."""
    ev = load(spark, sf, "events")["events"]
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.col("event_id").alias("cid"),
                      F.unix_micros("ts").alias("click_us")))
    j = as_of_join(purchases, clicks, on="user_id", left_ts="ts",
                   right_ts="ts", value_cols=["click_us"], tiebreak="cid")
    delay_s = ((F.unix_micros("ts") - F.col("asof_click_us"))
               / F.lit(1_000_000)).cast("long")
    bucket = (F.when(F.col("asof_click_us").isNull(), "never")
              .when(delay_s < 60, "lt_1m")
              .when(delay_s < 300, "lt_5m")
              .when(delay_s < 3600, "lt_1h")
              .when(delay_s < 21600, "lt_6h")
              .otherwise("ge_6h"))
    return (j.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").cast("long").alias("cnt")))


def user_path_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 most common user JOURNEYS — each user's first five
    event types in (ts, event_id) order joined into a path string,
    ranked by how many users share it (the product-analytics "top
    paths" report beside B43's one-step transition matrix).  Scale
    shape: a per-user row_number window keeps only each user's first
    5 events BEFORE the collect (bounded state per user — never
    collect_list over a user's whole history), and the groupBy that
    follows reuses the window's user_id hash partitioning, so the
    whole query is ONE exchange; the final rank runs over the tiny
    path-cardinality aggregate (≤ |event types|^5 rows).  Ties rank
    deterministically by (n_users DESC, path ASC)."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (ev.select("user_id", "ts", "event_id", "event_type")
             .withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= 5))
    per_user = steps.groupBy("user_id").agg(
        F.concat_ws(">", F.transform(
            F.array_sort(F.collect_list(F.struct("_rn", "event_type"))),
            lambda s: s["event_type"])).alias("path"))
    counts = per_user.groupBy("path").agg(
        F.count("*").cast("long").alias("n_users"))
    rk = Window.orderBy(F.desc("n_users"), F.asc("path"))
    return (counts
            .withColumn("rank", F.row_number().over(rk).cast("long"))
            .filter(F.col("rank") <= 20)
            .select("rank", "path", "n_users"))


def user_activity_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Activity DECILES — what share of events the top 10% / bottom
    10% of users generate (the engagement-concentration report).
    Scale-correct shape: deciles are NOT assigned per user via a
    global NTILE window (single-partition over every user — the
    anti-pattern); instead the users-sized count table collapses to
    a count-FREQUENCY table (one row per distinct activity level,
    ≪ users), a tiny cumulative window orders it, and each level's
    users are split across decile index ranges
    [⌊(d−1)·n/10⌋, ⌊d·n/10⌋) by exact interval intersection — pure
    integer arithmetic both engines replay verbatim.  Users at equal
    activity are interchangeable, so the aggregate split is exact
    without any per-user ordering."""
    ev = load(spark, sf, "events")["events"]
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    freq = _guard_freq_window(
        per_user.groupBy("cnt").agg(F.count("*").alias("u")),
        F.desc("cnt"))
    w = (Window.orderBy(F.desc("cnt"))
         .rowsBetween(Window.unboundedPreceding, -1))
    tot = Window.partitionBy()
    staged = (freq
              .withColumn("cum0", F.coalesce(F.sum("u").over(w),
                                             F.lit(0)))
              .withColumn("n", F.sum("u").over(tot)))
    d = F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile")
    ex = staged.select("cnt", "u", "cum0", "n", d)
    lo = F.expr("(decile - 1) * n DIV 10")
    hi = F.expr("decile * n DIV 10")
    take = (F.least(hi, F.col("cum0") + F.col("u"))
            - F.greatest(lo, F.col("cum0")))
    agg = (ex.withColumn("take", take).filter(F.col("take") > 0)
           .groupBy(F.col("decile").cast("long").alias("decile"))
           .agg(F.sum("take").cast("long").alias("n_users"),
                F.sum(F.col("take") * F.col("cnt")).cast("long")
                .alias("n_events")))
    # share over total events: a 10-row window, not another scan
    return agg.withColumn("share_e6", F.expr(
        "CAST(n_events * 1000000L DIV (SUM(n_events) OVER ()) "
        "AS BIGINT)"))


QUERIES["user_activity_deciles"] = user_activity_deciles

def user_active_time(spark: SparkSession, sf: str) -> DataFrame:
    """Total ACTIVE time per user — the engagement-time metric: the
    B12 sessionize islands (new session when the gap to the previous
    event exceeds 30 min) aggregated to durations: sessions counted,
    per-session span (last − first event, exact micros) summed and
    averaged (BIGINT DIV).  One user-keyed lag window + one
    (user, session) agg + one user agg — all on the same hash
    partitioning, ONE exchange."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = (ev.select("user_id", "ts", "event_id")
            .withColumn("_sid", F.sum(new_s).over(run)))
    per_sess = (sess.groupBy("user_id", "_sid")
                .agg((F.max(F.unix_micros("ts"))
                      - F.min(F.unix_micros("ts"))).alias("_dur")))
    return (per_sess.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("_dur").alias("active_us"))
            .select(F.col("user_id").cast("string").alias("key"),
                    F.col("n_sessions").cast("long"),
                    F.col("active_us").cast("long"),
                    F.expr("active_us DIV n_sessions").cast("long")
                    .alias("mean_session_us")))


QUERIES["user_active_time"] = user_active_time

ORACLES["user_active_time"] = """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), ps AS (
      SELECT user_id, sid,
             MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(dur) AS BIGINT) AS active_us,
           CAST(SUM(dur) // COUNT(*) AS BIGINT) AS mean_session_us
    FROM ps GROUP BY user_id
"""


def rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM SEGMENTATION — the classic marketing cut: per user,
    Recency (days since last event, measured against the corpus max
    ts), Frequency (event count), Monetary (exact Σvalue_e2), each
    banded by fixed thresholds (fixed, not data-derived quantiles —
    segment definitions must be stable across releases to be
    comparable), users counted per segment with exact totals.  The
    corpus max ts is a one-row broadcast (the scalar-join house
    pattern), the rest is one users-sized hash-agg + a
    segments-sized rollup."""
    ev = load(spark, sf, "events")["events"]
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("_mx"))
    per_user = (ev.groupBy("user_id")
                .agg(F.max(F.unix_micros("ts")).alias("_last"),
                     F.count("*").alias("_f"),
                     F.sum(F.round(F.col("value") * 100).cast("long"))
                     .alias("_m"))
                .crossJoin(F.broadcast(mx)))
    rdays = F.expr("(_mx - _last) DIV 86400000000")
    r_b = (F.when(rdays == 0, "r_hot").otherwise("r_cool"))
    f_b = (F.when(F.col("_f") >= 70, "f_high")
           .when(F.col("_f") >= 55, "f_mid").otherwise("f_low"))
    m_b = (F.when(F.col("_m") >= 400_000, "m_high")
           .when(F.col("_m") >= 280_000, "m_mid").otherwise("m_low"))
    return (per_user
            .select(F.concat_ws("/", r_b, f_b, m_b).alias("segment"),
                    "_f", "_m")
            .groupBy("segment")
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.sum("_f").cast("long").alias("n_events"),
                 F.sum("_m").cast("long").alias("value_e2")))


QUERIES["rfm_segments"] = rfm_segments

ORACLES["rfm_segments"] = """
    WITH mx AS (
      SELECT MAX(epoch_us(ts)) AS m FROM events
    ), pu AS (
      SELECT user_id, MAX(epoch_us(ts)) AS last,
             COUNT(*) AS f,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS mval
      FROM events GROUP BY user_id
    ), lab AS (
      SELECT (CASE WHEN (mx.m - last) // 86400000000 = 0
                   THEN 'r_hot' ELSE 'r_cool' END)
             || '/' ||
             (CASE WHEN f >= 70 THEN 'f_high'
                   WHEN f >= 55 THEN 'f_mid' ELSE 'f_low' END)
             || '/' ||
             (CASE WHEN mval >= 400000 THEN 'm_high'
                   WHEN mval >= 280000 THEN 'm_mid'
                   ELSE 'm_low' END) AS segment,
             f, mval
      FROM pu, mx
    )
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(f) AS BIGINT) AS n_events,
           CAST(SUM(mval) AS BIGINT) AS value_e2
    FROM lab GROUP BY segment
"""


def activity_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of user activity — the single
    inequality number beside B58's decile table, computed EXACTLY
    from the same count-frequency shape (never a per-user global
    sort): for users sorted ascending by count, G = (2·Σi·xᵢ)/(n·S)
    − (n+1)/n; a frequency row (count c, u users, k users below)
    contributes c·(u·k + u(u+1)/2) to Σi·xᵢ in closed form because
    tied users are interchangeable.  All terms are exact BIGINTs;
    gini_e6 = (2A − (n+1)S)·1e6 DIV (nS).  One users-sized hash-agg,
    one tiny frequency agg + cumulative window, one 1-row result."""
    ev = load(spark, sf, "events")["events"]
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    freq = _guard_freq_window(
        per_user.groupBy("cnt").agg(F.count("*").alias("u")), "cnt")
    w = (Window.orderBy("cnt")
         .rowsBetween(Window.unboundedPreceding, -1))
    staged = freq.withColumn(
        "k", F.coalesce(F.sum("u").over(w), F.lit(0)))
    a = F.sum(F.col("cnt") * (F.col("u") * F.col("k")
                              + F.expr("u * (u + 1) DIV 2")))
    return (staged.agg(
        F.sum(F.col("u")).alias("_n"),
        F.sum(F.col("cnt") * F.col("u")).alias("_s"),
        a.alias("_a"))
        .select(F.col("_n").cast("long").alias("n_users"),
                F.col("_s").cast("long").alias("n_events"),
                F.expr("(2 * _a - (_n + 1) * _s) * 1000000L "
                       "DIV (_n * _s)").cast("long")
                .alias("gini_e6")))


QUERIES["activity_gini"] = activity_gini

ORACLES["activity_gini"] = """
    WITH pu AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), freq AS (
      SELECT cnt, COUNT(*) AS u FROM pu GROUP BY cnt
    ), staged AS (
      SELECT cnt, u,
             COALESCE(SUM(u) OVER (ORDER BY cnt ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS k
      FROM freq
    )
    SELECT CAST(SUM(u) AS BIGINT) AS n_users,
           CAST(SUM(cnt * u) AS BIGINT) AS n_events,
           CAST((2 * SUM(cnt * (u * k + u * (u + 1) // 2))
                 - (SUM(u) + 1) * SUM(cnt * u)) * 1000000
                // (SUM(u) * SUM(cnt * u)) AS BIGINT) AS gini_e6
    FROM staged
"""


ORACLES["user_activity_deciles"] = """
    WITH pu AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), freq AS (
      SELECT cnt, COUNT(*) AS u FROM pu GROUP BY cnt
    ), staged AS (
      SELECT cnt, u,
             COALESCE(SUM(u) OVER (ORDER BY cnt DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum0,
             SUM(u) OVER () AS n
      FROM freq
    ), ex AS (
      SELECT cnt, u, cum0, n, d.decile
      FROM staged, (SELECT UNNEST(range(1, 11)) AS decile) d
    ), took AS (
      SELECT decile, cnt,
             LEAST(decile * n // 10, cum0 + u)
               - GREATEST((decile - 1) * n // 10, cum0) AS take
      FROM ex
    ), agg AS (
      SELECT decile,
             CAST(SUM(take) AS BIGINT) AS n_users,
             CAST(SUM(take * cnt) AS BIGINT) AS n_events
      FROM took WHERE take > 0 GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_users, n_events,
           CAST(n_events * 1000000 // (SUM(n_events) OVER ())
                AS BIGINT) AS share_e6
    FROM agg
"""


def stickiness_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / trailing-30-day-MAU stickiness per active day — the
    engagement ratio every consumer product tracks.  The trailing
    distinct is computed by the BOUNDED-explode shape (each distinct
    (user, day) contributes to the 30 days it can influence —
    constant factor 30, linear overall, never a per-day rescan of
    30 days of raw events; the 100 TB alternative is the HLL sketch,
    but at constant 30 the exact form is cheap), then one distinct
    count per day restricted to days that actually had activity.
    stickiness_e6 = DAU·1e6 DIV MAU, exact integers throughout."""
    ev = load(spark, sf, "events")["events"]
    days = (ev.select("user_id", F.to_date("ts").alias("d"))
            .distinct())
    dau = days.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    contrib = days.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 29)))
        .alias("md"))
    mau = (contrib.distinct()
           .join(dau.select(F.col("d").alias("md")), "md")
           .groupBy("md").agg(F.count("*").cast("long").alias("mau")))
    return (dau.join(mau, dau["d"] == mau["md"])
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "dau", "mau",
                    F.expr("dau * 1000000L DIV mau").cast("long")
                    .alias("stickiness_e6")))


QUERIES["stickiness_dau_mau"] = stickiness_dau_mau

ORACLES["stickiness_dau_mau"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), dau AS (
      SELECT d, COUNT(*) AS dau FROM ud GROUP BY d
    ), mau AS (
      SELECT m.d, COUNT(DISTINCT u.user_id) AS mau
      FROM dau m JOIN ud u
        ON u.d BETWEEN m.d - 29 AND m.d
      GROUP BY m.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(dau.dau * 1000000 // mau.mau AS BIGINT)
             AS stickiness_e6
    FROM dau JOIN mau USING (d)
"""


def retention_triangle(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention TRIANGLE — the standard product-analytics
    cohort matrix B21's one-row-per-cohort summary cannot express:
    users bucketed by first-active week (epoch-week = days-since-
    1970 DIV 7, pure integer arithmetic so engines cannot disagree
    on week boundaries), and for every (cohort_week, week_offset)
    the count of cohort users active that week.  Shape: one distinct
    (user, week) hash-agg, a per-user min (cohort) agg on the same
    key, an equi-join back, and the final small agg — user-keyed
    throughout, no window."""
    ev = load(spark, sf, "events")["events"]
    wk = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
          / 7).cast("long")
    uw = (ev.select("user_id", wk.alias("wk")).distinct())
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (uw.join(cohort, "user_id")
            .groupBy(F.col("cw").alias("cohort_week"),
                     (F.col("wk") - F.col("cw")).alias("week_offset"))
            .agg(F.count("*").cast("long").alias("n_users")))


QUERIES["retention_triangle"] = retention_triangle

ORACLES["retention_triangle"] = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS wk
      FROM events
    ), c AS (
      SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id
    )
    SELECT CAST(cw AS BIGINT) AS cohort_week,
           CAST(wk - cw AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN c USING (user_id)
    GROUP BY cw, wk - cw
"""


def activation_delay_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Signup → first-purchase ACTIVATION latency distribution — the
    forward twin of B49's conversion delay: for each signup, the
    delay until the same user's EARLIEST following purchase via
    as_of_join(direction="forward") (one hash exchange, the same
    union+window kernel traversed in reverse), exact integer delay
    bucketed into activation bands; signups never followed by a
    purchase count in 'never'.  Forward ties (purchase at the signup
    instant) resolve to the largest event_id in both engines."""
    ev = load(spark, sf, "events")["events"]
    signups = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", F.col("event_id").alias("signup_id"),
                       "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts",
                         F.col("event_id").alias("pid"),
                         F.unix_micros("ts").alias("p_us")))
    j = as_of_join(signups, purchases, on="user_id", left_ts="ts",
                   right_ts="ts", value_cols=["p_us"], tiebreak="pid",
                   direction="forward")
    delay_s = ((F.col("asof_p_us") - F.unix_micros("ts"))
               / F.lit(1_000_000)).cast("long")
    bucket = (F.when(F.col("asof_p_us").isNull(), "never")
              .when(delay_s < 3600, "lt_1h")
              .when(delay_s < 21600, "lt_6h")
              .when(delay_s < 86400, "lt_24h")
              .when(delay_s < 259200, "lt_72h")
              .otherwise("ge_72h"))
    return (j.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").cast("long").alias("cnt")))


QUERIES["activation_delay_buckets"] = activation_delay_buckets

ORACLES["activation_delay_buckets"] = """
    WITH s AS (
      SELECT user_id, event_id AS signup_id, ts, epoch_us(ts) AS s_us
      FROM events WHERE event_type = 'signup'
    ), p AS (
      SELECT user_id, ts, event_id AS pid, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ), ao AS (
      SELECT s.signup_id, s.s_us,
             (SELECT p.p_us FROM p
              WHERE p.user_id = s.user_id AND p.ts >= s.ts
              ORDER BY p.ts ASC, p.pid DESC LIMIT 1) AS p_us
      FROM s
    ), lab AS (
      SELECT CASE
               WHEN p_us IS NULL THEN 'never'
               WHEN (p_us - s_us) // 1000000 < 3600 THEN 'lt_1h'
               WHEN (p_us - s_us) // 1000000 < 21600 THEN 'lt_6h'
               WHEN (p_us - s_us) // 1000000 < 86400 THEN 'lt_24h'
               WHEN (p_us - s_us) // 1000000 < 259200 THEN 'lt_72h'
               ELSE 'ge_72h'
             END AS bucket
      FROM ao
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lab GROUP BY bucket
"""


def max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum drawdown per user — the classic risk statistic over
    each user's value series in (ts, event_id) order: running peak
    via a prefix-max window, drawdown = peak − value, report the
    worst one (plus the peak and the series length).  Exact integers
    at the data's native e2 precision.  Same single-exchange shape as
    time_weighted_avg: the prefix-max window and the per-user agg
    share the user_id hash partitioning — ONE shuffle total."""
    ev = load(spark, sf, "events")["events"]
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    v_e2 = F.round(F.col("value") * 100).cast("long")
    stepped = ev.select(
        "user_id", v_e2.alias("_v"),
        (F.max(v_e2).over(w) - v_e2).alias("_dd"))
    return (stepped.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.max("_v").alias("peak_e2"),
                 F.max("_dd").alias("max_drawdown_e2"))
            .select(F.col("user_id").cast("string").alias("key"),
                    F.col("n_events").cast("long"),
                    F.col("peak_e2").cast("long"),
                    F.col("max_drawdown_e2").cast("long")))


def funnel_steps_timed(spark: SparkSession, sf: str) -> DataFrame:
    """Time-BOUNDED multi-step funnel (signup → click → purchase,
    each step within 24 HOURS of the previous step's chosen event —
    sized so every stage fires on the test data) — the windowed
    funnel B20's unbounded first-click/last-purchase
    report cannot express: per user the FIRST signup, then the first
    qualifying click (strictly after it, ≤ 24 h later), then any
    qualifying purchase after that click.  Each step picks MIN(ts)
    among qualifiers, so tied minima are harmless (the next window is
    identical either way) and both engines agree exactly.  Shape: a
    per-user signup agg, two user-keyed equi-joins with the window
    predicate as a post-join filter (never a range join), a
    stage-labelled union, and a 3-row count — every join keys on
    user_id so the exchanges chain on one partitioning."""
    ev = load(spark, sf, "events")["events"]
    step_us = 24 * 3_600_000_000
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", "ts").join(s, "user_id")
         .filter((F.col("ts") > F.col("s_ts"))
                 & (F.unix_micros("ts")
                    <= F.unix_micros("s_ts") + step_us))
         .groupBy("user_id").agg(F.min("ts").alias("c_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", "ts").join(c, "user_id")
         .filter((F.col("ts") > F.col("c_ts"))
                 & (F.unix_micros("ts")
                    <= F.unix_micros("c_ts") + step_us))
         .select("user_id").distinct())
    lab = (s.select("user_id").withColumn("stage", F.lit("signup"))
           .unionByName(c.select("user_id")
                        .withColumn("stage", F.lit("signup>click")))
           .unionByName(p.withColumn(
               "stage", F.lit("signup>click>purchase"))))
    return (lab.groupBy("stage")
            .agg(F.count("*").cast("long").alias("n_users")))


QUERIES["funnel_steps_timed"] = funnel_steps_timed

ORACLES["funnel_steps_timed"] = """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.s_ts
        AND epoch_us(e.ts) <= epoch_us(s.s_ts) + 86400000000
      GROUP BY e.user_id
    ), p AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        AND epoch_us(e.ts) <= epoch_us(c.c_ts) + 86400000000
    ), lab AS (
      SELECT 'signup' AS stage, user_id FROM s
      UNION ALL SELECT 'signup>click', user_id FROM c
      UNION ALL SELECT 'signup>click>purchase', user_id FROM p
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lab GROUP BY stage
"""


QUERIES["max_drawdown"] = max_drawdown

ORACLES["max_drawdown"] = """
    WITH s AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             MAX(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM events
    )
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(v) AS BIGINT) AS peak_e2,
           CAST(MAX(peak - v) AS BIGINT) AS max_drawdown_e2
    FROM s GROUP BY user_id
"""


QUERIES["user_path_topk"] = user_path_topk

ORACLES["user_path_topk"] = """
    WITH pu AS (
      SELECT user_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:5], '>')
               AS path
      FROM events GROUP BY user_id
    ), c AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM pu GROUP BY path
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, path)
                AS BIGINT) AS rank,
           path, n_users
    FROM c
    QUALIFY rank <= 20
"""


QUERIES["conversion_delay_buckets"] = conversion_delay_buckets

ORACLES["conversion_delay_buckets"] = """
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, event_id AS cid, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'
    ), ao AS (
      SELECT p.purchase_id, p.p_us,
             (SELECT c.click_us FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts
              ORDER BY c.ts DESC, c.cid DESC LIMIT 1) AS click_us
      FROM p
    ), lab AS (
      SELECT CASE
               WHEN click_us IS NULL THEN 'never'
               WHEN (p_us - click_us) // 1000000 < 60 THEN 'lt_1m'
               WHEN (p_us - click_us) // 1000000 < 300 THEN 'lt_5m'
               WHEN (p_us - click_us) // 1000000 < 3600 THEN 'lt_1h'
               WHEN (p_us - click_us) // 1000000 < 21600 THEN 'lt_6h'
               ELSE 'ge_6h'
             END AS bucket
      FROM ao
    )
    SELECT bucket, COUNT(*) AS cnt FROM lab GROUP BY bucket
"""


QUERIES["volume_anomalies_robust"] = volume_anomalies_robust

ORACLES["volume_anomalies_robust"] = """
    WITH c AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, h
    ), rk AS (
      SELECT event_type, h, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt, h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    ), med AS (
      SELECT event_type, cnt AS med FROM rk WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT c.event_type, c.h, c.cnt, m.med,
             ABS(c.cnt - m.med) AS d
      FROM c JOIN med m USING (event_type)
    ), rk2 AS (
      SELECT event_type, d,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY d, h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type, d AS mad FROM rk2 WHERE rn = (n + 1) // 2
    )
    SELECT dev.event_type, epoch_us(dev.h) AS hour_us, dev.cnt,
           dev.med, CAST(mad.mad AS BIGINT) AS mad,
           (dev.cnt > dev.med
            AND (dev.cnt - dev.med) * 10000 > 44478 * mad.mad)
             AS is_spike
    FROM dev JOIN mad USING (event_type)
"""


def seasonality_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal heatmap table — events per (type, day-of-week, hour)
    with each cell's share of its type (integer micro-units): the
    when-do-users-show-up profile behind send-time optimization and
    capacity planning.  Day-of-week is computed as pure integer
    arithmetic ((epoch_days + 3) % 7, Monday = 0 — 1970-01-01 was a
    Thursday) because the engines' dayofweek() builtins disagree on
    numbering; hour from the same UTC timestamp both engines store.
    One hash-agg + a types-sized broadcast total."""
    ev = load(spark, sf, "events")["events"]
    dow = ((F.datediff(F.to_date("ts"),
                       F.lit("1970-01-01").cast("date")) + 3) % 7) \
        .cast("long")
    cell = (ev.groupBy(F.col("event_type"), dow.alias("dow"),
                       F.hour("ts").cast("long").alias("hour"))
            .agg(F.count("*").cast("long").alias("cnt")))
    tot = cell.groupBy("event_type").agg(F.sum("cnt").alias("_t"))
    return (cell.join(F.broadcast(tot), "event_type")
            .select("event_type", "dow", "hour", "cnt",
                    F.expr("cnt * 1000000L DIV _t").cast("long")
                    .alias("share_e6")))


QUERIES["seasonality_profile"] = seasonality_profile

ORACLES["seasonality_profile"] = """
    WITH cell AS (
      SELECT event_type,
             (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              + 3) % 7 AS dow,
             hour(ts) AS hour, COUNT(*) AS cnt
      FROM events GROUP BY event_type, dow, hour
    ), tot AS (
      SELECT event_type, SUM(cnt) AS t FROM cell GROUP BY event_type
    )
    SELECT cell.event_type, CAST(dow AS BIGINT) AS dow,
           CAST(hour AS BIGINT) AS hour, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // t AS BIGINT) AS share_e6
    FROM cell JOIN tot USING (event_type)
"""


def cohort_ltv_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort LTV CURVE (r9) — B56's retention triangle with money:
    per (cohort_week, week_offset), active users, the value they
    generated that week (exact Σvalue_e2), and the cohort's
    CUMULATIVE value through that offset — the curve whose plateau
    is the cohort's lifetime value.  Same shape as the triangle
    (distinct-week agg + same-key min + equi-join) plus one
    cumulative window over the tiny (cohort, offset) aggregate."""
    ev = load(spark, sf, "events")["events"]
    wk = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
          / 7).cast("long")
    uw = (ev.select("user_id", wk.alias("wk"),
                    F.round(F.col("value") * 100).cast("long")
                    .alias("v_e2"))
          .groupBy("user_id", "wk")
          .agg(F.sum("v_e2").alias("v_e2")))
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    cell = (uw.join(cohort, "user_id")
            .groupBy(F.col("cw").alias("cohort_week"),
                     (F.col("wk") - F.col("cw")).alias("week_offset"))
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.sum("v_e2").cast("long").alias("value_e2")))
    wc = (Window.partitionBy("cohort_week").orderBy("week_offset")
          .rowsBetween(Window.unboundedPreceding, 0))
    return cell.withColumn(
        "cum_value_e2", F.sum("value_e2").over(wc).cast("long"))


QUERIES["cohort_ltv_curve"] = cohort_ltv_curve

ORACLES["cohort_ltv_curve"] = """
    WITH uw AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS wk,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v_e2
      FROM events GROUP BY user_id, wk
    ), c AS (
      SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id
    ), cell AS (
      SELECT cw AS cohort_week, wk - cw AS week_offset,
             COUNT(*) AS n_users, SUM(v_e2) AS value_e2
      FROM uw JOIN c USING (user_id)
      GROUP BY cw, wk - cw
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(value_e2 AS BIGINT) AS value_e2,
           CAST(SUM(value_e2) OVER (PARTITION BY cohort_week
                                    ORDER BY week_offset
                                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_value_e2
    FROM cell
"""


def new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """Daily NEW vs RETURNING split (r9) — the growth dashboard's
    first row: per active day, users seen for the first time that
    day vs users who had been seen before, with each group's event
    volume.  First-seen day via one per-user min; the daily split is
    a (user, day) distinct + equi-join + small agg — user-keyed
    exchanges throughout."""
    ev = load(spark, sf, "events")["events"]
    ud = (ev.select("user_id", F.to_date("ts").alias("d"))
          .groupBy("user_id", "d")
          .agg(F.count("*").cast("long").alias("ev")))
    first = ud.groupBy("user_id").agg(F.min("d").alias("fd"))
    j = ud.join(first, "user_id")
    is_new = (F.col("d") == F.col("fd"))
    return (j.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
            .agg(F.sum(F.when(is_new, 1).otherwise(0)).cast("long")
                 .alias("new_users"),
                 F.sum(F.when(~is_new, 1).otherwise(0)).cast("long")
                 .alias("returning_users"),
                 F.sum(F.when(is_new, F.col("ev")).otherwise(0))
                 .cast("long").alias("new_events"),
                 F.sum(F.when(~is_new, F.col("ev")).otherwise(0))
                 .cast("long").alias("returning_events")))


QUERIES["new_vs_returning"] = new_vs_returning

ORACLES["new_vs_returning"] = """
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS ev
      FROM events GROUP BY user_id, d
    ), f AS (
      SELECT user_id, MIN(d) AS fd FROM ud GROUP BY user_id
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d = fd THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN d = fd THEN 0 ELSE 1 END) AS BIGINT)
             AS returning_users,
           CAST(SUM(CASE WHEN d = fd THEN ev ELSE 0 END) AS BIGINT)
             AS new_events,
           CAST(SUM(CASE WHEN d = fd THEN 0 ELSE ev END) AS BIGINT)
             AS returning_events
    FROM ud JOIN f USING (user_id)
    GROUP BY d
"""


def hourly_session_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Concurrent SESSIONS per hour (r9) — the capacity-planning
    series: how many user sessions (B12's 30-min-gap islands) were
    live in each hour.  Each session explodes onto the hours its
    [first, last] span covers — a BOUNDED fanout (span is capped by
    real user activity; the all-hours alternative rescans every
    session per hour) — then one hash-agg per hour.  Peak hours are
    the rows with max active_sessions."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = (ev.select("user_id", "ts", "event_id")
            .withColumn("_sid", F.sum(new_s).over(run))
            .groupBy("user_id", "_sid")
            .agg(F.date_trunc("hour", F.min("ts")).alias("_h0"),
                 F.date_trunc("hour", F.max("ts")).alias("_h1")))
    hours = F.explode(F.sequence(
        F.col("_h0"), F.col("_h1"),
        F.expr("INTERVAL 1 HOUR"))).alias("_h")
    return (sess.select(hours)
            .groupBy(F.unix_micros("_h").alias("hour_us"))
            .agg(F.count("*").cast("long").alias("active_sessions")))


QUERIES["hourly_session_concurrency"] = hourly_session_concurrency

ORACLES["hourly_session_concurrency"] = """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), ps AS (
      SELECT user_id, sid,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM s GROUP BY user_id, sid
    ), hrs AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM ps
    )
    SELECT epoch_us(h) AS hour_us,
           CAST(COUNT(*) AS BIGINT) AS active_sessions
    FROM hrs GROUP BY h
"""


def weekly_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Week-over-week GROWTH per event type (r9) — the trend number
    on every metrics review: per (type, epoch-week) counts with the
    previous week's count and the exact integer growth rate
    ((c − prev)·1e6 DIV prev; null on a type's first week).  Weeks
    by the same integer arithmetic as B56; one hash-agg + a lag
    window over the tiny (type, week) table."""
    ev = load(spark, sf, "events")["events"]
    wk = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
          / 7).cast("long")
    cell = (ev.groupBy("event_type", wk.alias("week"))
            .agg(F.count("*").cast("long").alias("cnt")))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("cnt").over(w)
    return (cell.withColumn("prev_cnt", prev.cast("long"))
            .withColumn("growth_e6",
                        F.when(prev.isNotNull(),
                               F.expr("(cnt - prev_cnt) * 1000000L "
                                      "DIV prev_cnt")).cast("long")))


QUERIES["weekly_growth"] = weekly_growth

ORACLES["weekly_growth"] = """
    WITH cell AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS week,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, week
    )
    SELECT event_type, CAST(week AS BIGINT) AS week,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(LAG(cnt) OVER (PARTITION BY event_type ORDER BY week)
                AS BIGINT) AS prev_cnt,
           CAST((cnt - LAG(cnt) OVER (PARTITION BY event_type
                                      ORDER BY week)) * 1000000
                // LAG(cnt) OVER (PARTITION BY event_type
                                  ORDER BY week) AS BIGINT)
             AS growth_e6
    FROM cell
"""


def peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT peak concurrent sessions (r9) — the sweep-line upgrade
    of B66's hourly grain: +1/−1 deltas at session starts/ends,
    running-sum maximum over the global time order via the
    DISTRIBUTED two-pass prefix sum (functions/text.py's
    range-partition + per-partition offsets kernel — never a
    single-task global window).  Starts sort before ends at the same
    instant (key = 2·t_us for starts, 2·t_us+1 for ends), and since
    equal keys carry equal deltas, tie order cannot change the set
    of running values — peak and its first time are engine-exact.
    One row: the peak and when it first happened."""
    from goka_spark.functions.text import _global_prefix_sum

    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = (ev.select("user_id", "ts", "event_id")
            .withColumn("_sid", F.sum(new_s).over(run))
            .groupBy("user_id", "_sid")
            .agg(F.min(F.unix_micros("ts")).alias("s_us"),
                 F.max(F.unix_micros("ts")).alias("e_us")))
    deltas = (sess.select((F.col("s_us") * 2).alias("k"),
                          F.lit(1).alias("d"))
              .unionByName(sess.select(
                  (F.col("e_us") * 2 + 1).alias("k"),
                  F.lit(-1).alias("d"))))
    ps = _global_prefix_sum(deltas, "k", "d")
    runv = (ps.withColumn("_run", F.col("_cum_before") + F.col("d"))
            .select("k", "_run"))
    peak = runv.agg(F.max("_run").alias("_p"))
    return (runv.join(F.broadcast(peak), runv["_run"] == peak["_p"])
            .agg(F.max("_run").cast("long").alias("peak_sessions"),
                 F.expr("MIN(k) DIV 2").cast("long")
                 .alias("first_peak_us")))


QUERIES["peak_concurrency"] = peak_concurrency

ORACLES["peak_concurrency"] = """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), ps AS (
      SELECT MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
      FROM s GROUP BY user_id, sid
    ), deltas AS (
      SELECT s_us * 2 AS k, 1 AS d FROM ps
      UNION ALL
      SELECT e_us * 2 + 1 AS k, -1 AS d FROM ps
    ), runv AS (
      SELECT k, SUM(d) OVER (ORDER BY k
                             ROWS UNBOUNDED PRECEDING) AS run
      FROM deltas
    )
    SELECT CAST(MAX(run) AS BIGINT) AS peak_sessions,
           CAST(MIN(CASE WHEN run = (SELECT MAX(run) FROM runv)
                         THEN k END) // 2 AS BIGINT) AS first_peak_us
    FROM runv
"""


def session_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """WITHIN-SESSION funnel (r9) — signup → click → purchase all
    inside one 30-min-gap session, in order: the intent-flow question
    B53's cross-session time-window funnel cannot answer.  Ordered
    reachability via running-flag windows over the (ts, event_id)
    total order: a click counts only if a signup happened STRICTLY
    BEFORE it in the same session (rowsBetween(…, -1)), a purchase
    only after such a click — three windows + one agg, all on the
    user partitioning, ONE exchange."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = (ev.select("user_id", "ts", "event_id", "event_type")
            .withColumn("_sid", F.sum(new_s).over(run)))
    ws = Window.partitionBy("user_id", "_sid").orderBy("ts", "event_id")
    before = ws.rowsBetween(Window.unboundedPreceding, -1)
    is_s = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    f2 = F.when((F.col("event_type") == "click")
                & (F.coalesce(F.max(is_s).over(before), F.lit(0)) == 1),
                1).otherwise(0)
    staged = sess.withColumn("_f2", f2)
    f3 = F.when((F.col("event_type") == "purchase")
                & (F.coalesce(F.max(F.col("_f2")).over(before),
                              F.lit(0)) == 1),
                1).otherwise(0)
    per = (staged.withColumn("_f3", f3)
           .groupBy("user_id", "_sid")
           .agg(F.max(is_s).alias("s1"), F.max("_f2").alias("s2"),
                F.max("_f3").alias("s3")))
    return per.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("s1").cast("long").alias("with_signup"),
        F.sum("s2").cast("long").alias("signup_then_click"),
        F.sum("s3").cast("long").alias("full_funnel"))


QUERIES["session_funnel"] = session_funnel

ORACLES["session_funnel"] = """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), st AS (
      SELECT user_id, sid, ts, event_id, event_type,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_s,
             CASE WHEN event_type = 'click'
                  AND COALESCE(MAX(CASE WHEN event_type = 'signup'
                                        THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id, sid
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) = 1
                  THEN 1 ELSE 0 END AS f2
      FROM s
    ), st3 AS (
      SELECT user_id, sid, is_s, f2,
             CASE WHEN event_type = 'purchase'
                  AND COALESCE(MAX(f2)
                        OVER (PARTITION BY user_id, sid
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) = 1
                  THEN 1 ELSE 0 END AS f3
      FROM st
    ), per AS (
      SELECT user_id, sid, MAX(is_s) AS s1, MAX(f2) AS s2,
             MAX(f3) AS s3
      FROM st3 GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(s1) AS BIGINT) AS with_signup,
           CAST(SUM(s2) AS BIGINT) AS signup_then_click,
           CAST(SUM(s3) AS BIGINT) AS full_funnel
    FROM per
"""


def type_mix_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Event-MIX drift per week (r9) — the composition-shift monitor:
    each week's event-type shares against the corpus baseline share,
    with the exact integer drift |week_share − overall_share| in
    micro-units — a sustained drift is an instrumentation or product
    change the volume monitors (B46/B62) cannot see because totals
    look normal.  One (type, week) hash-agg + tiny broadcast
    baselines."""
    ev = load(spark, sf, "events")["events"]
    wk = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
          / 7).cast("long")
    cell = (ev.groupBy("event_type", wk.alias("week"))
            .agg(F.count("*").alias("cnt")))
    wtot = cell.groupBy("week").agg(F.sum("cnt").alias("wt"))
    ttot = cell.groupBy("event_type").agg(F.sum("cnt").alias("tt"))
    gtot = cell.agg(F.sum("cnt").alias("gt"))
    return (cell.join(F.broadcast(wtot), "week")
            .join(F.broadcast(ttot), "event_type")
            .crossJoin(F.broadcast(gtot))
            .select("event_type", F.col("week").cast("long"),
                    F.col("cnt").cast("long"),
                    F.expr("cnt * 1000000L DIV wt").cast("long")
                    .alias("week_share_e6"),
                    F.expr("tt * 1000000L DIV gt").cast("long")
                    .alias("overall_share_e6"),
                    F.abs(F.expr("cnt * 1000000L DIV wt")
                          - F.expr("tt * 1000000L DIV gt"))
                    .cast("long").alias("drift_e6")))


QUERIES["type_mix_drift"] = type_mix_drift

ORACLES["type_mix_drift"] = """
    WITH cell AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS week,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, week
    ), wtot AS (
      SELECT week, SUM(cnt) AS wt FROM cell GROUP BY week
    ), ttot AS (
      SELECT event_type, SUM(cnt) AS tt FROM cell GROUP BY event_type
    ), gtot AS (SELECT SUM(cnt) AS gt FROM cell)
    SELECT cell.event_type, CAST(week AS BIGINT) AS week,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // wt AS BIGINT) AS week_share_e6,
           CAST(tt * 1000000 // gt AS BIGINT) AS overall_share_e6,
           CAST(ABS(cnt * 1000000 // wt - tt * 1000000 // gt)
                AS BIGINT) AS drift_e6
    FROM cell
    JOIN wtot USING (week) JOIN ttot USING (event_type), gtot
"""


def event_cooccurrence_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Event-type CO-OCCURRENCE lift per user (B72) — the
    market-basket question over behaviors: which event types show up
    in the SAME users far more (or less) often than independence
    predicts.  lift_e6 = n_ab·N·1e6 DIV (n_a·n_b) with n_x = users
    who did x, n_ab = users who did both, N = all users — >1e6 means
    the behaviors attract, <1e6 they repel (e.g. error↔purchase).

    Scale shape: one distinct on (user, type) — a hash-agg — then a
    SELF-JOIN ON THE USER KEY (co-partitioned, per-user fan-out
    bounded by the type-count T, so the pair stage is ≤ T²/2 rows
    per user, never all-pairs over users), tiny type marginals +
    one-row N broadcast onto the T²-sized pair table.  Exact BIGINT
    arithmetic holds while n_ab·N ≤ 9.2e12 (plenty at any per-shard
    grain; shard-and-merge beyond)."""
    ev = load(spark, sf, "events")["events"]
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (a.join(b, "user_id")
             .filter(F.col("a.event_type") < F.col("b.event_type"))
             .groupBy(F.col("a.event_type").alias("type_a"),
                      F.col("b.event_type").alias("type_b"))
             .agg(F.count("*").alias("n_ab")))
    marg = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    n_users = ut.select("user_id").distinct() \
        .agg(F.count("*").alias("_N"))
    return (pairs
            .join(F.broadcast(marg.withColumnsRenamed(
                {"event_type": "type_a", "n": "n_a"})), "type_a")
            .join(F.broadcast(marg.withColumnsRenamed(
                {"event_type": "type_b", "n": "n_b"})), "type_b")
            .crossJoin(F.broadcast(n_users))
            .select("type_a", "type_b",
                    F.col("n_ab").cast("long"),
                    F.expr("n_ab * 1000000L DIV _N").cast("long")
                    .alias("support_e6"),
                    F.expr("n_ab * _N * 1000000L DIV (n_a * n_b)")
                    .cast("long").alias("lift_e6")))


QUERIES["event_cooccurrence_lift"] = event_cooccurrence_lift

ORACLES["event_cooccurrence_lift"] = """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY type_a, type_b
    ), marg AS (
      SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ), nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut)
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab * 1000000 // n_users AS BIGINT) AS support_e6,
           CAST(n_ab * n_users * 1000000 // (ma.n * mb.n) AS BIGINT)
             AS lift_e6
    FROM pairs
    JOIN marg ma ON ma.event_type = pairs.type_a
    JOIN marg mb ON mb.event_type = pairs.type_b, nu
"""


def growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly GROWTH ACCOUNTING (B73) — the canonical user-state
    decomposition every growth team runs: per week, actives split
    into new (first week ever), retained (also active last week) and
    resurrected (active before, skipped ≥1 week), plus churned
    (active last week, absent this week).  The identity
    active = new + retained + resurrected holds by construction;
    churn can land on weeks with zero actives (everyone left), which
    the full-outer week join keeps.

    Scale shape: distinct (user, week) hash-agg, ONE user-keyed
    window (lag + lead + running first-week), then two week-keyed
    hash-aggs full-outer-joined — no self-joins, no per-week scans.
    The censoring rule (nobody churns after the corpus's last week)
    broadcasts a one-row max."""
    from pyspark.sql import Window as _W

    ev = load(spark, sf, "events")["events"]
    uw = (ev.select("user_id",
                    F.expr("datediff(to_date(ts), DATE '1970-01-01')"
                           " div 7").alias("week"))
          .distinct())
    w = _W.partitionBy("user_id").orderBy("week")
    seq = (uw.withColumn("_prev", F.lag("week").over(w))
           .withColumn("_next", F.lead("week").over(w)))
    states = (seq.groupBy("week")
              .agg(F.sum(F.when(F.col("_prev").isNull(), 1)
                         .otherwise(0)).cast("long").alias("n_new"),
                   F.sum(F.when(F.col("_prev") == F.col("week") - 1, 1)
                         .otherwise(0)).cast("long").alias("n_retained"),
                   F.sum(F.when(F.col("_prev") < F.col("week") - 1, 1)
                         .otherwise(0)).cast("long")
                   .alias("n_resurrected"),
                   F.count("*").cast("long").alias("n_active")))
    mx = uw.agg(F.max("week").alias("_mx"))
    churn = (seq.crossJoin(F.broadcast(mx))
             .filter((F.col("week") < F.col("_mx"))
                     & (F.coalesce(F.col("_next"),
                                   F.lit(4611686018427387904))
                        != F.col("week") + 1))
             .groupBy((F.col("week") + 1).alias("week"))
             .agg(F.count("*").cast("long").alias("n_churned")))
    return (states.join(churn, "week", "full")
            .select(F.col("week").cast("long"),
                    F.coalesce("n_new", F.lit(0)).cast("long")
                    .alias("n_new"),
                    F.coalesce("n_retained", F.lit(0)).cast("long")
                    .alias("n_retained"),
                    F.coalesce("n_resurrected", F.lit(0)).cast("long")
                    .alias("n_resurrected"),
                    F.coalesce("n_churned", F.lit(0)).cast("long")
                    .alias("n_churned"),
                    F.coalesce("n_active", F.lit(0)).cast("long")
                    .alias("n_active")))


QUERIES["growth_accounting"] = growth_accounting

ORACLES["growth_accounting"] = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS week
      FROM events
    ), seq AS (
      SELECT user_id, week,
             LAG(week) OVER (PARTITION BY user_id ORDER BY week)
               AS prev,
             LEAD(week) OVER (PARTITION BY user_id ORDER BY week)
               AS nxt
      FROM uw
    ), states AS (
      SELECT week,
             SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN prev = week - 1 THEN 1 ELSE 0 END)
               AS n_retained,
             SUM(CASE WHEN prev < week - 1 THEN 1 ELSE 0 END)
               AS n_resurrected,
             COUNT(*) AS n_active
      FROM seq GROUP BY week
    ), mx AS (SELECT MAX(week) AS m FROM uw),
    churn AS (
      SELECT week + 1 AS week, COUNT(*) AS n_churned
      FROM seq, mx
      WHERE week < m AND COALESCE(nxt, 4611686018427387904) != week + 1
      GROUP BY week + 1
    )
    SELECT CAST(COALESCE(states.week, churn.week) AS BIGINT) AS week,
           CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
           CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
           CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
           CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active
    FROM states FULL OUTER JOIN churn ON states.week = churn.week
"""


def seasonal_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """SEASONALLY-ADJUSTED volume anomalies (B74) — B45/B62 flag "is
    this hour big", this one flags "is this hour big FOR a Monday
    9am": each (type, date, hour) cell is scored against the
    median/MAD of its OWN (type, weekday, hour-of-day) bucket across
    the corpus's weeks, so the daily/weekly rhythm B63 profiles
    stops producing false alarms and a quiet-hour incident stops
    hiding under the busy-hour baseline.  Same exact-integer robust
    discipline as B62: lower median (k = (n+1) DIV 2), MAD over
    |c − med|, spike ⟺ (c − med)·10000 > 44478·mad ∧ c > med.
    Engine-neutral weekday (epoch_days + 3) % 7 (0 = Monday).

    Scale shape: the cell table is (types × days × 24)-sized — built
    by ONE hash-agg over the stream; both medians are windows over
    that small frame partitioned by the ~types×168 bucket key, and
    the bucket stats broadcast back.  Nothing touches raw events
    twice."""
    from goka_spark.operators.windows import (seasonal_cells,
                                              seasonal_score)

    ev = load(spark, sf, "events")["events"]
    return seasonal_score(seasonal_cells(ev))


QUERIES["seasonal_anomalies"] = seasonal_anomalies

ORACLES["seasonal_anomalies"] = """
    WITH cell AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS cnt
      FROM events GROUP BY event_type, d, hod
    ), c2 AS (
      SELECT *,
             (date_diff('day', DATE '1970-01-01', d) + 3) % 7 AS dow
      FROM cell
    ), med AS (
      SELECT event_type, dow, hod, cnt AS med FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, dow, hod
                                     ORDER BY cnt, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type, dow, hod) AS n
        FROM c2) WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT c2.*, med, ABS(cnt - med) AS adev
      FROM c2 JOIN med USING (event_type, dow, hod)
    ), mad AS (
      SELECT event_type, dow, hod, adev AS mad FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, dow, hod
                                     ORDER BY adev, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type, dow, hod) AS n
        FROM dev) WHERE rn = (n + 1) // 2
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(hod AS BIGINT) AS hod, CAST(dow AS BIGINT) AS dow,
           CAST(cnt AS BIGINT) AS cnt, CAST(med AS BIGINT) AS med,
           CAST(mad AS BIGINT) AS mad,
           cnt > med AND (cnt - med) * 10000 > 44478 * mad AS is_spike
    FROM dev JOIN mad USING (event_type, dow, hod)
"""


def activation_correlates(spark: SparkSession, sf: str) -> DataFrame:
    """ACTIVATION correlates (B76) — the "aha moment" table: for
    each event type, the week-1 retention rate of users who did it
    in their FIRST week vs users who did not, and the lift between
    the two.  The discovery analysis behind every activation metric
    ("users who X in week 0 retain 2× better").  Retention target:
    active in first_week + 1 (B73's retained definition applied to
    the cohort's second week).

    Scale shape: one distinct (user, week), one per-user min, one
    distinct (user, week-0 type) — all user-keyed hash-aggs/joins —
    then a types-sized aggregate with a one-row cohort broadcast.
    The per-type rows compare WITH vs WITHOUT via cohort-total
    subtraction, so no anti-join is ever materialized."""
    ev = load(spark, sf, "events")["events"]
    uw = (ev.select("user_id",
                    F.expr("datediff(to_date(ts), DATE '1970-01-01')"
                           " div 7").alias("wk"))
          .distinct())
    first = uw.groupBy("user_id").agg(F.min("wk").alias("fw"))
    ret = (uw.join(first, "user_id")
           .groupBy("user_id")
           .agg(F.max((F.col("wk") == F.col("fw") + 1).cast("long"))
                .alias("retained")))
    cohort = (first.join(ret, "user_id")
              .agg(F.count("*").cast("long").alias("_n"),
                   F.sum("retained").cast("long").alias("_r")))
    w0types = (ev.select("user_id",
                         F.expr("datediff(to_date(ts), DATE "
                                "'1970-01-01') div 7").alias("wk"),
                         "event_type")
               .join(first, "user_id")
               .filter(F.col("wk") == F.col("fw"))
               .select("user_id", "event_type").distinct())
    per_type = (w0types.join(ret, "user_id")
                .groupBy("event_type")
                .agg(F.count("*").cast("long").alias("n_with"),
                     F.sum("retained").cast("long").alias("ret_with")))
    return (per_type.crossJoin(F.broadcast(cohort))
            .select(
                "event_type", "n_with",
                F.expr("ret_with * 1000000L DIV n_with").cast("long")
                .alias("ret_with_e6"),
                (F.col("_n") - F.col("n_with")).cast("long")
                .alias("n_without"),
                F.expr("(_r - ret_with) * 1000000L"
                       " DIV greatest(_n - n_with, 1L)").cast("long")
                .alias("ret_without_e6"),
                F.expr("(ret_with * 1000000L DIV n_with) * 1000L"
                       " DIV greatest((_r - ret_with) * 1000000L"
                       " DIV greatest(_n - n_with, 1L), 1L)")
                .cast("long").alias("lift_e3")))


QUERIES["activation_correlates"] = activation_correlates

ORACLES["activation_correlates"] = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS wk
      FROM events
    ), first AS (
      SELECT user_id, MIN(wk) AS fw FROM uw GROUP BY user_id
    ), ret AS (
      SELECT uw.user_id,
             MAX(CASE WHEN wk = fw + 1 THEN 1 ELSE 0 END) AS retained
      FROM uw JOIN first USING (user_id) GROUP BY uw.user_id
    ), cohort AS (
      SELECT COUNT(*) AS n, SUM(retained) AS r FROM ret
    ), w0 AS (
      SELECT DISTINCT e.user_id, e.event_type
      FROM (SELECT user_id, event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) // 7 AS wk
            FROM events) e
      JOIN first ON first.user_id = e.user_id AND e.wk = first.fw
    ), pt AS (
      SELECT event_type, COUNT(*) AS n_with,
             SUM(retained) AS ret_with
      FROM w0 JOIN ret USING (user_id) GROUP BY event_type
    )
    SELECT event_type, CAST(n_with AS BIGINT) AS n_with,
           CAST(ret_with * 1000000 // n_with AS BIGINT)
             AS ret_with_e6,
           CAST(n - n_with AS BIGINT) AS n_without,
           CAST((r - ret_with) * 1000000 // greatest(n - n_with, 1)
                AS BIGINT) AS ret_without_e6,
           CAST((ret_with * 1000000 // n_with) * 1000
                // greatest((r - ret_with) * 1000000
                            // greatest(n - n_with, 1), 1) AS BIGINT)
             AS lift_e3
    FROM pt, cohort
"""


def engagement_mix_by_decile(spark: SparkSession, sf: str) -> DataFrame:
    """Engagement MIX by activity decile (B77) — do heavy users do
    proportionally more purchasing or just more clicking?  The
    composition question B58's concentration report can't answer.
    Per (activity decile, event type): events and the share of the
    decile's volume in micro-units.

    Per-user decile assignment stays scale-correct: NO global NTILE
    (the single-partition anti-pattern) — the users-sized count
    table collapses to the count-frequency form (B58's kernel), a
    tiny cumulative window gives each activity level its rank
    offset, and each user's rank is offset + row_number within its
    OWN level (a cnt-partitioned window, never global); decile =
    (rank·10 − 1) DIV n + 1 with rank 1-based.  Ties broken by
    user_id so both engines assign identically."""
    ev = load(spark, sf, "events")["events"]
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    freq = per_user.groupBy("cnt").agg(F.count("*").alias("u"))
    wcum = (Window.orderBy(F.desc("cnt"))
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (freq.withColumn("cum0", F.coalesce(F.sum("u").over(wcum),
                                               F.lit(0)))
            .withColumn("n", F.sum("u").over(Window.partitionBy())))
    wlvl = Window.partitionBy("cnt").orderBy("user_id")
    ranked = (per_user.withColumn("_rn", F.row_number().over(wlvl))
              .join(F.broadcast(offs.select("cnt", "cum0", "n")),
                    "cnt")
              .select("user_id",
                      F.expr("((cum0 + _rn) * 10 - 1) DIV n + 1")
                      .alias("decile")))
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("e"))
    mix = (ut.join(ranked, "user_id")
           .groupBy("decile", "event_type")
           .agg(F.sum("e").cast("long").alias("n_events")))
    return (mix.select(F.col("decile").cast("long"), "event_type",
                       "n_events",
                       F.expr("CAST(n_events * 1000000L DIV "
                              "(SUM(n_events) OVER (PARTITION BY "
                              "decile)) AS BIGINT)")
                       .alias("share_e6")))


QUERIES["engagement_mix_by_decile"] = engagement_mix_by_decile

ORACLES["engagement_mix_by_decile"] = """
    WITH pu AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), freq AS (
      SELECT cnt, COUNT(*) AS u FROM pu GROUP BY cnt
    ), offs AS (
      SELECT cnt,
             COALESCE(SUM(u) OVER (ORDER BY cnt DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum0,
             SUM(u) OVER () AS n
      FROM freq
    ), ranked AS (
      SELECT pu.user_id,
             ((cum0 + ROW_NUMBER() OVER (PARTITION BY pu.cnt
                                         ORDER BY pu.user_id))
              * 10 - 1) // n + 1 AS decile
      FROM pu JOIN offs ON offs.cnt = pu.cnt
    ), ut AS (
      SELECT user_id, event_type, COUNT(*) AS e
      FROM events GROUP BY user_id, event_type
    ), mix AS (
      SELECT decile, event_type, SUM(e) AS n_events
      FROM ut JOIN ranked USING (user_id)
      GROUP BY decile, event_type
    )
    SELECT CAST(decile AS BIGINT) AS decile, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events * 1000000 //
                (SUM(n_events) OVER (PARTITION BY decile)) AS BIGINT)
             AS share_e6
    FROM mix
"""


def error_impact(spark: SparkSession, sf: str) -> DataFrame:
    """Session-level ERROR impact (B79) — does hitting an error end
    the visit?  Sessions (30-min islands) split by whether they
    contain an error event: count, mean events per session, mean
    duration, and the rage-quit rate (sessions whose LAST event is
    the error).  The reliability number an on-call review wants next
    to B46's volume spikes — errors that don't shorten sessions are
    cosmetic, errors that end them are churn.

    One user-keyed lag window (sessionize) + per-session agg on the
    same partitioning + a 2-row output agg.  Means are exact
    integers: ·1e2/·1e0 micro-unit discipline, duration in seconds
    DIV by session count."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) \
        - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = (ev.withColumn("_sid", F.sum(new_s).over(run))
            .groupBy("user_id", "_sid")
            .agg(F.count("*").cast("long").alias("n_ev"),
                 F.max(F.when(F.col("event_type") == "error", 1)
                       .otherwise(0)).alias("has_err"),
                 (F.max(F.unix_micros("ts"))
                  - F.min(F.unix_micros("ts"))).alias("dur_us"),
                 F.max_by("event_type",
                          F.struct(F.col("ts"), F.col("event_id")))
                 .alias("last_type")))
    return (sess.groupBy(F.col("has_err").cast("long").alias("has_error"))
            .agg(F.count("*").cast("long").alias("n_sessions"),
                 F.expr("sum(n_ev) * 100L DIV count(*)").cast("long")
                 .alias("mean_events_e2"),
                 F.expr("sum(dur_us DIV 1000000) DIV count(*)")
                 .cast("long").alias("mean_duration_s"),
                 F.expr("sum(CASE WHEN last_type = 'error' THEN 1 "
                        "ELSE 0 END) * 1000000L DIV count(*)")
                 .cast("long").alias("rage_quit_e6")))


QUERIES["error_impact"] = error_impact

ORACLES["error_impact"] = """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS s
      FROM seq
    ), sess AS (
      SELECT user_id, s, COUNT(*) AS n_ev,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS has_err,
             MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us
      FROM sid GROUP BY user_id, s
    ), last AS (
      SELECT user_id, s, event_type AS last_type FROM (
        SELECT user_id, s, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, s
                                  ORDER BY ts DESC, event_id DESC)
                 AS rn
        FROM sid) WHERE rn = 1
    ), sess2 AS (
      SELECT sess.*, last.last_type
      FROM sess JOIN last USING (user_id, s)
    )
    SELECT CAST(has_err AS BIGINT) AS has_error,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_ev) * 100 // COUNT(*) AS BIGINT)
             AS mean_events_e2,
           CAST(SUM(dur_us // 1000000) // COUNT(*) AS BIGINT)
             AS mean_duration_s,
           CAST(SUM(CASE WHEN last_type = 'error' THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS rage_quit_e6
    FROM sess2 GROUP BY has_err
"""


def session_depth_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Session DEPTH vs conversion (B80) — do deeper sessions buy?
    Sessions (30-min islands) bucketed by event depth (1 / 2-3 /
    4-7 / 8+), each bucket's share of sessions and purchase rate —
    the engagement-depth argument every funnel review leans on, and
    the denominator check B20's step funnel can't give (it never
    sees sessions that skipped the funnel entirely).

    Same single user-keyed window as B79/event_sessionize, then a
    4-row output agg; depth buckets via exact integer thresholds."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) \
        - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = (ev.withColumn("_sid", F.sum(new_s).over(run))
            .groupBy("user_id", "_sid")
            .agg(F.count("*").alias("n_ev"),
                 F.max(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("conv")))
    bucket = (F.when(F.col("n_ev") == 1, "1")
              .when(F.col("n_ev") <= 3, "2-3")
              .when(F.col("n_ev") <= 7, "4-7")
              .otherwise("8+"))
    agg = (sess.groupBy(bucket.alias("depth"))
           .agg(F.count("*").cast("long").alias("n_sessions"),
                F.sum("conv").cast("long").alias("n_converted")))
    tot = agg.agg(F.sum("n_sessions").alias("_T"))
    return (agg.crossJoin(F.broadcast(tot))
            .select("depth", "n_sessions",
                    F.expr("n_sessions * 1000000L DIV _T").cast("long")
                    .alias("share_e6"),
                    "n_converted",
                    F.expr("n_converted * 1000000L DIV n_sessions")
                    .cast("long").alias("conv_e6")))


QUERIES["session_depth_funnel"] = session_depth_funnel

ORACLES["session_depth_funnel"] = """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS s
      FROM seq
    ), sess AS (
      SELECT user_id, s, COUNT(*) AS n_ev,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM sid GROUP BY user_id, s
    ), agg AS (
      SELECT CASE WHEN n_ev = 1 THEN '1'
                  WHEN n_ev <= 3 THEN '2-3'
                  WHEN n_ev <= 7 THEN '4-7' ELSE '8+' END AS depth,
             COUNT(*) AS n_sessions, SUM(conv) AS n_converted
      FROM sess GROUP BY depth
    ), tot AS (SELECT SUM(n_sessions) AS t FROM agg)
    SELECT depth, CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_sessions * 1000000 // t AS BIGINT) AS share_e6,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(n_converted * 1000000 // n_sessions AS BIGINT)
             AS conv_e6
    FROM agg, tot
"""


def revenue_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Gini of REVENUE concentration (B81) — B59 measures event
    inequality; this measures the money: per-user purchase value
    summed in exact cents (value·100 rounded ONCE per event, the
    OHLC quantization discipline), then the same count-frequency
    closed form (tied users interchangeable) — "what share of
    revenue rides on the whale tail" with a top-decile share
    alongside.  One users-sized hash-agg, one frequency agg +
    cumulative window, 1-row output."""
    ev = load(spark, sf, "events")["events"]
    v_e2 = F.round(F.col("value") * 100).cast("long")
    per_user = (ev.filter(F.col("event_type") == "purchase")
                .groupBy("user_id")
                .agg(F.sum(v_e2).alias("rev")))
    freq = _guard_freq_window(
        per_user.groupBy("rev").agg(F.count("*").alias("u")), "rev")
    w = (Window.orderBy("rev")
         .rowsBetween(Window.unboundedPreceding, -1))
    staged = (freq.withColumn(
        "k", F.coalesce(F.sum("u").over(w), F.lit(0)))
        .withColumn("n", F.sum("u").over(Window.partitionBy())))
    a = F.sum(F.col("rev") * (F.col("u") * F.col("k")
                              + F.expr("u * (u + 1) DIV 2")))
    # top-decile revenue share from the same staged frame: users
    # with rank > n - n DIV 10 (the richest ⌊n/10⌋), split across
    # the boundary frequency row by exact interval intersection
    return (staged.agg(
        F.sum(F.col("u")).alias("_n"),
        F.sum(F.col("rev") * F.col("u")).alias("_s"),
        a.alias("_a"),
        F.sum(F.greatest(
            F.lit(0),
            F.least(F.col("u"),
                    F.col("k") + F.col("u")
                    - (F.col("n") - F.expr("n DIV 10"))))
          * F.col("rev")).alias("_t"))
        .select(F.col("_n").cast("long").alias("n_buyers"),
                F.col("_s").cast("long").alias("revenue_e2"),
                F.expr("(2 * _a - (_n + 1) * _s) * 1000000L "
                       "DIV (_n * _s)").cast("long").alias("gini_e6"),
                F.expr("_t * 1000000L DIV _s").cast("long")
                .alias("top_decile_share_e6")))


QUERIES["revenue_gini"] = revenue_gini

ORACLES["revenue_gini"] = """
    WITH pu AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), freq AS (
      SELECT rev, COUNT(*) AS u FROM pu GROUP BY rev
    ), staged AS (
      SELECT rev, u,
             COALESCE(SUM(u) OVER (ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS k,
             SUM(u) OVER () AS n
      FROM freq
    )
    SELECT CAST(SUM(u) AS BIGINT) AS n_buyers,
           CAST(SUM(rev * u) AS BIGINT) AS revenue_e2,
           CAST((2 * SUM(rev * (u * k + u * (u + 1) // 2))
                 - (SUM(u) + 1) * SUM(rev * u)) * 1000000
                // (SUM(u) * SUM(rev * u)) AS BIGINT) AS gini_e6,
           CAST(SUM(GREATEST(0, LEAST(u, k + u - (n - n // 10)))
                    * rev) * 1000000 // SUM(rev * u) AS BIGINT)
             AS top_decile_share_e6
    FROM staged
"""


def daily_arpu(spark: SparkSession, sf: str) -> DataFrame:
    """Daily ARPU + purchase conversion (B82) — the revenue line
    beside B65's new/returning split: per active day, distinct
    actives, distinct purchasers, revenue in exact cents (one
    quantization per event), ARPU = revenue DIV actives and the
    buyer conversion rate.  Two day-keyed hash-aggs joined on the
    tiny day key — the stream is scanned once per measure."""
    ev = load(spark, sf, "events")["events"]
    v_e2 = F.round(F.col("value") * 100).cast("long")
    act = (ev.groupBy(F.to_date("ts").alias("_d"))
           .agg(F.countDistinct("user_id").alias("actives")))
    buy = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("_d"))
           .agg(F.countDistinct("user_id").alias("buyers"),
                F.sum(v_e2).alias("rev_e2")))
    return (act.join(buy, "_d", "left")
            .select(F.date_format("_d", "yyyy-MM-dd").alias("day"),
                    F.col("actives").cast("long"),
                    F.coalesce("buyers", F.lit(0)).cast("long")
                    .alias("buyers"),
                    F.coalesce("rev_e2", F.lit(0)).cast("long")
                    .alias("revenue_e2"),
                    F.expr("coalesce(rev_e2, 0L) DIV actives")
                    .cast("long").alias("arpu_e2"),
                    F.expr("coalesce(buyers, 0L) * 1000000L"
                           " DIV actives").cast("long")
                    .alias("conversion_e6")))


QUERIES["daily_arpu"] = daily_arpu

ORACLES["daily_arpu"] = """
    WITH act AS (
      SELECT CAST(ts AS DATE) AS d,
             COUNT(DISTINCT user_id) AS actives
      FROM events GROUP BY d
    ), buy AS (
      SELECT CAST(ts AS DATE) AS d,
             COUNT(DISTINCT user_id) AS buyers,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY d
    )
    SELECT strftime(act.d, '%Y-%m-%d') AS day,
           CAST(actives AS BIGINT) AS actives,
           CAST(COALESCE(buyers, 0) AS BIGINT) AS buyers,
           CAST(COALESCE(rev, 0) AS BIGINT) AS revenue_e2,
           CAST(COALESCE(rev, 0) // actives AS BIGINT) AS arpu_e2,
           CAST(COALESCE(buyers, 0) * 1000000 // actives AS BIGINT)
             AS conversion_e6
    FROM act LEFT JOIN buy ON act.d = buy.d
"""


# ---------------------------------------------------------------------
# r12 additions (freeze-lift batch)
# ---------------------------------------------------------------------


def user_event_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-USER event-type entropy histogram (B83) — the behavioral-
    diversity profile: single-action users (bots, scrapers, drive-bys)
    sit in bucket 0, engaged multi-surface users spread right — the
    user-level twin of doc_entropy's corpus gate.  Micro-nat
    discipline (the doc_entropy contract): each c·ln(c) term
    integerized once, per-user sums exact integers, H_e6 = ln(N)_e6 −
    Σterm DIV N; 0.1-nat buckets capped at 20.  Two hash-aggs —
    (user, type) then user — both map-side combinable."""
    ev = load(spark, sf, "events")["events"]
    ut = (ev.groupBy("user_id", "event_type")
          .agg(F.count("*").alias("c")))
    term_e6 = F.floor(1e6 * F.col("c") * F.log(F.col("c")) + 0.5) \
        .cast("long")
    per_u = (ut.groupBy("user_id")
             .agg(F.sum("c").alias("n"),
                  F.sum(term_e6).alias("t")))
    h_e6 = (F.floor(1e6 * F.log(F.col("n")) + 0.5).cast("long")
            - F.expr("t DIV n"))
    b = F.least(F.floor(h_e6 / 100000), F.lit(20)).cast("long")
    return (per_u.select(h_e6.alias("_h"), b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.expr("SUM(_h) DIV COUNT(*)").cast("long")
                 .alias("mean_h_e6")))


QUERIES["user_event_entropy"] = user_event_entropy

ORACLES["user_event_entropy"] = """
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), per_u AS (
      SELECT user_id, SUM(c) AS n,
             SUM(CAST(FLOOR(1000000.0 * c * LN(c) + 0.5) AS BIGINT))
               AS t
      FROM ut GROUP BY user_id
    ), h AS (
      SELECT CAST(FLOOR(1000000.0 * LN(n) + 0.5) AS BIGINT) - t // n
               AS h_e6
      FROM per_u
    )
    SELECT CAST(LEAST(FLOOR(h_e6 / 100000), 20) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(h_e6) // COUNT(*) AS BIGINT) AS mean_h_e6
    FROM h GROUP BY 1
"""


def interarrival_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user interarrival BURSTINESS histogram (B84) — the squared
    coefficient of variation of event gaps: CV² ≈ 1 is Poisson
    (memoryless), ≪ 1 is a scheduler/cron, ≫ 1 is bursty human
    sessions — the one-number answer to "is this account automated?"
    that B39's corpus-level gap stats can't give per user.  Gaps in
    whole minutes (micros DIV 6e7) keep every square inside BIGINT;
    cv2_e3 = (n·Σg² − (Σg)²)·1e3 DIV max((Σg)², 1) is exact
    integers end-to-end (no sqrt — the token_burstiness VMR trick).
    One ordered per-user window + two hash-aggs."""
    ev = load(spark, sf, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ((F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))) / 60000000) \
        .cast("long")
    g = ev.select("user_id", gap.alias("g")).filter(F.col("g").isNotNull())
    per_u = (g.groupBy("user_id")
             .agg(F.count("*").alias("n"), F.sum("g").alias("sg"),
                  F.sum(F.col("g") * F.col("g")).alias("sg2"))
             .filter(F.col("n") >= 2))
    cv2 = F.expr("(n * sg2 - sg * sg) * 1000L"
                 " DIV greatest(sg * sg, 1L)")
    b = F.least(F.floor(cv2 / 250), F.lit(15)).cast("long")
    return (per_u.select(cv2.alias("_c"), b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.expr("SUM(_c) DIV COUNT(*)").cast("long")
                 .alias("mean_cv2_e3")))


QUERIES["interarrival_burstiness"] = interarrival_burstiness

ORACLES["interarrival_burstiness"] = """
    WITH g AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))
               // 60000000 AS g
      FROM events
    ), per_u AS (
      SELECT user_id, COUNT(*) AS n, SUM(g) AS sg,
             SUM(g * g) AS sg2
      FROM g WHERE g IS NOT NULL GROUP BY user_id
      HAVING COUNT(*) >= 2
    ), c AS (
      SELECT CAST((n * sg2 - sg * sg) * 1000
                  // greatest(sg * sg, 1) AS BIGINT) AS cv2
      FROM per_u
    )
    SELECT CAST(LEAST(FLOOR(cv2 / 250), 15) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(cv2) // COUNT(*) AS BIGINT) AS mean_cv2_e3
    FROM c GROUP BY 1
"""


def weekday_weekend_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Weekday/weekend activity mix per event type (B85) — the
    work-vs-leisure split behind staffing and send-time decisions,
    complementing B63's full heatmap with the one-number split and
    the distinct-user view (volume can shift while the audience
    doesn't).  Day-of-week by pure integer arithmetic ((epoch_days +
    3) % 7, Monday = 0 — the B63 convention, engine-independent).
    One conditional hash-agg."""
    ev = load(spark, sf, "events")["events"]
    dow = ((F.datediff(F.to_date("ts"),
                       F.lit("1970-01-01").cast("date")) + 3) % 7)
    we = (dow >= 5).cast("long")
    return (ev.select("event_type", "user_id", we.alias("_we"))
            .groupBy("event_type")
            .agg(F.sum(1 - F.col("_we")).cast("long")
                 .alias("n_weekday"),
                 F.sum("_we").cast("long").alias("n_weekend"),
                 F.count_distinct(
                     F.when(F.col("_we") == 1, F.col("user_id")))
                 .cast("long").alias("weekend_users"))
            .select("event_type", "n_weekday", "n_weekend",
                    F.expr("n_weekend * 1000000L DIV"
                           " greatest(n_weekday + n_weekend, 1L)")
                    .cast("long").alias("weekend_share_e6"),
                    "weekend_users"))


QUERIES["weekday_weekend_mix"] = weekday_weekend_mix

ORACLES["weekday_weekend_mix"] = """
    WITH d AS (
      SELECT event_type, user_id,
             CASE WHEN (datediff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) + 3) % 7 >= 5
                  THEN 1 ELSE 0 END AS we
      FROM events
    )
    SELECT event_type,
           CAST(SUM(1 - we) AS BIGINT) AS n_weekday,
           CAST(SUM(we) AS BIGINT) AS n_weekend,
           CAST(SUM(we) * 1000000
                // greatest(SUM(1 - we) + SUM(we), 1) AS BIGINT)
             AS weekend_share_e6,
           CAST(COUNT(DISTINCT CASE WHEN we = 1 THEN user_id END)
                AS BIGINT) AS weekend_users
    FROM d GROUP BY event_type
"""


def priority_latency_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Ship-delay QUANTILES per order priority (B86) — does URGENT
    actually ship faster: exact p50/p90 of (l_shipdate −
    o_orderdate) days per priority class, beside the exact-integer
    mean.  Quantiles by the count-frequency closed form (cumulative
    counts over the bounded distinct day values per priority — the
    deciles/Gini discipline, never a global row sort): p50 = min d
    with 2·cum ≥ n, p90 = min d with 10·cum ≥ 9n."""
    t = load(spark, sf, "orders", "lineitem")
    delay = F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date")).cast("long")
    byd = (t["lineitem"]
           .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy(F.col("o_orderpriority").alias("priority"),
                    delay.alias("d"))
           .agg(F.count("*").alias("cnt")))
    wc = (Window.partitionBy("priority").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("priority")
    staged = (byd.withColumn("_cum", F.sum("cnt").over(wc))
              .withColumn("_n", F.sum("cnt").over(wt)))
    return (staged.groupBy("priority")
            .agg(F.max("_n").cast("long").alias("n_items"),
                 F.expr("SUM(d * cnt) * 100 DIV MAX(_n)").cast("long")
                 .alias("mean_delay_e2"),
                 F.min(F.when(F.col("_cum") * 2 >= F.col("_n"),
                              F.col("d"))).cast("long").alias("p50"),
                 F.min(F.when(F.col("_cum") * 10 >= 9 * F.col("_n"),
                              F.col("d"))).cast("long").alias("p90")))


QUERIES["priority_latency_quantiles"] = priority_latency_quantiles

ORACLES["priority_latency_quantiles"] = """
    WITH byd AS (
      SELECT o_orderpriority AS priority,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS d,
             COUNT(*) AS cnt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), staged AS (
      SELECT priority, d, cnt,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS n
      FROM byd
    )
    SELECT priority, CAST(MAX(n) AS BIGINT) AS n_items,
           CAST(SUM(d * cnt) * 100 // MAX(n) AS BIGINT)
             AS mean_delay_e2,
           CAST(MIN(CASE WHEN cum * 2 >= n THEN d END) AS BIGINT)
             AS p50,
           CAST(MIN(CASE WHEN cum * 10 >= 9 * n THEN d END)
                AS BIGINT) AS p90
    FROM staged GROUP BY priority
"""


def nation_ship_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier-NATION ship latency (B87) — the supply-chain health
    cut q7/q9 (revenue views) never show: per supplier nation, item
    volume, exact-integer mean ship delay, and the slow-share (> 60
    days) — which geography is the fulfillment bottleneck.  Shape:
    lineitem⋈orders on the fact keys, then two dim hops — nation
    broadcast by hint, supplier AQE-chosen (SF-proportional dims
    never get a forced hint); one hash-agg."""
    t = load(spark, sf, "orders", "lineitem", "supplier", "nation")
    delay = F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date")).cast("long")
    j = (t["lineitem"]
         .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["supplier"],
               F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(t["nation"]),
               F.col("s_nationkey") == F.col("n_nationkey")))
    return (j.select(F.col("n_name").alias("nation"), delay.alias("_d"))
            .groupBy("nation")
            .agg(F.count("*").cast("long").alias("n_items"),
                 F.expr("SUM(_d) * 100 DIV COUNT(*)").cast("long")
                 .alias("mean_delay_e2"),
                 F.sum((F.col("_d") > 60).cast("long")).cast("long")
                 .alias("n_slow"))
            .select("nation", "n_items", "mean_delay_e2", "n_slow",
                    F.expr("n_slow * 1000000L DIV n_items")
                    .cast("long").alias("slow_share_e6")))


QUERIES["nation_ship_latency"] = nation_ship_latency

ORACLES["nation_ship_latency"] = """
    WITH j AS (
      SELECT n_name AS nation,
             datediff('day', CAST(o_orderdate AS DATE),
                      CAST(l_shipdate AS DATE)) AS d
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(d) * 100 // COUNT(*) AS BIGINT) AS mean_delay_e2,
           CAST(SUM(CASE WHEN d > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_slow,
           CAST(SUM(CASE WHEN d > 60 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS slow_share_e6
    FROM j GROUP BY nation
"""


def brand_price_spread(spark: SparkSession, sf: str) -> DataFrame:
    """Retail-price SPREAD per brand (B88) — catalog QA: a brand
    whose min/max span is implausibly wide has bad data or mixed
    catalogs; exact integer cents (price quantized once at its
    native 2-decimal precision), mean by BIGINT DIV.  One scan +
    one hash-agg over the part dim."""
    t = load(spark, sf, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return (t["part"].select(F.col("p_brand").alias("brand"),
                             cents.alias("_c"))
            .groupBy("brand")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.min("_c").cast("long").alias("min_price_e2"),
                 F.max("_c").cast("long").alias("max_price_e2"),
                 F.expr("SUM(_c) DIV COUNT(*)").cast("long")
                 .alias("mean_price_e2"))
            .withColumn("spread_e2",
                        (F.col("max_price_e2")
                         - F.col("min_price_e2")).cast("long")))


QUERIES["brand_price_spread"] = brand_price_spread

ORACLES["brand_price_spread"] = """
    SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(c) AS BIGINT) AS min_price_e2,
           CAST(MAX(c) AS BIGINT) AS max_price_e2,
           CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_price_e2,
           CAST(MAX(c) - MIN(c) AS BIGINT) AS spread_e2
    FROM (
      SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c
      FROM part
    ) GROUP BY p_brand
"""


def mktsegment_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Market-segment revenue share per order year (B89) — the
    executive mix table: each segment's order volume, exact-cent
    revenue, and share of that year's total.  The customer⋈orders join
    strategy is AQE's call (customer is SF-proportional — hundreds of
    GB at 100 TB, so never force-broadcast); per-year totals are a years-sized
    broadcast back — no second fact scan, no window over the fact."""
    t = load(spark, sf, "orders", "customer")
    rev = F.round(F.col("o_totalprice") * 100).cast("long")
    g = (t["orders"]
         .join(t["customer"],
               F.col("o_custkey") == F.col("c_custkey"))
         .groupBy(F.col("c_mktsegment").alias("mktsegment"),
                  F.year("o_orderdate").cast("long").alias("o_year"))
         .agg(F.count("*").cast("long").alias("n_orders"),
              F.sum(rev).alias("revenue_e2")))
    yt = g.groupBy("o_year").agg(F.sum("revenue_e2").alias("_yt"))
    return (g.join(F.broadcast(yt), "o_year")
            .select("mktsegment", "o_year", "n_orders",
                    F.col("revenue_e2").cast("long"),
                    F.expr("revenue_e2 * 1000000L DIV _yt")
                    .cast("long").alias("share_e6")))


QUERIES["mktsegment_revenue_share"] = mktsegment_revenue_share

ORACLES["mktsegment_revenue_share"] = """
    WITH g AS (
      SELECT c_mktsegment AS mktsegment,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), yt AS (
      SELECT o_year, SUM(rev) AS t FROM g GROUP BY o_year
    )
    SELECT mktsegment, g.o_year,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev AS BIGINT) AS revenue_e2,
           CAST(rev * 1000000 // t AS BIGINT) AS share_e6
    FROM g JOIN yt ON g.o_year = yt.o_year
"""


def order_fanout_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Order FAN-OUT profile (B90) — lineitems per order as a
    histogram: the order-size distribution behind picking/packing
    capacity and the fact-table skew check (a fat-tailed fan-out is
    where a naive orders⋈lineitem join skews).  Orders with no
    lineitems surface at fanout 0 via the left join — the data-QA
    branch an inner join hides.  Two hash-aggs, no window."""
    t = load(spark, sf, "orders", "lineitem")
    per = (t["orders"].join(
        t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"),
        "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("fanout")))
    tot = per.groupBy().agg(F.count("*").alias("_n"))
    return (per.groupBy(F.col("fanout").cast("long").alias("fanout"))
            .agg(F.count("*").cast("long").alias("n_orders"))
            .crossJoin(F.broadcast(tot))
            .select("fanout", "n_orders",
                    F.expr("n_orders * 1000000L DIV _n").cast("long")
                    .alias("share_e6")))


QUERIES["order_fanout_histogram"] = order_fanout_histogram

ORACLES["order_fanout_histogram"] = """
    WITH per AS (
      SELECT o_orderkey, COUNT(l_orderkey) AS fanout
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey
    ), tot AS (SELECT COUNT(*) AS n FROM per)
    SELECT CAST(fanout AS BIGINT) AS fanout,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 1000000 // n AS BIGINT) AS share_e6
    FROM per, tot GROUP BY fanout, n
"""


def _pareto_ranked_part(spark: SparkSession, sf: str,
                        pin: bool = True) -> DataFrame:
    """The range-partitioned, PINNED per-user value frame the Pareto
    rank runs over — split out so the plan test can assert the range
    exchange on the pre-barrier lineage.

    r13 re-plan: the original Window.partitionBy(event_type) ranked
    EVERY user of a type in ONE task (parallelism = n_event_types —
    a single-task sort of the whole type at 100 TB).  Instead, the
    grouped cousin of functions/text.py:_global_prefix_sum:
    range-partition on the FULL rank key (type, v DESC, user) so
    the global per-type order is preserved ACROSS partitions, take
    tiny per-(partition, type) counts/sums, convert them to
    exclusive offsets with a window over that partition-count-sized
    frame (distributed — never collected), broadcast the offsets
    back, and let a per-(partition, type) local window finish the
    rank.  Every sort task now handles one range slice, whatever
    the type's cardinality.

    r13 ADVICE (medium): BOTH downstream consumers — the pstats
    offset pass and the staged rank pass — read this exchange, and
    the offsets are only valid if both see the IDENTICAL partition
    assignment.  A bare exchange can be recomputed (or AQE-coalesced
    differently) per consumer; localCheckpoint pins the partition
    layout the way the connected-components loop does
    (functions/dedup.py) — cache alone is not a barrier."""
    ev = load(spark, sf, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    per_u = (ev.groupBy("event_type", "user_id")
             .agg(F.sum(cents).alias("v")))
    part = (per_u.repartitionByRange(F.col("event_type"),
                                     F.col("v").desc(),
                                     F.col("user_id"))
            .withColumn("_pid", F.spark_partition_id()))
    # pin=False exists ONLY so the plan test can assert the range
    # exchange on the pre-barrier lineage (the checkpointed frame
    # plans as a bare ExistingRDD scan, hiding it)
    return part.localCheckpoint(eager=True) if pin else part


def value_pareto_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """Top-decile value CONCENTRATION per event type (B91) — the
    Pareto number ("whales' share") beside B81's full Gini: per
    type, what share of total value the top 10% of users carry.
    Exact integers: per-user cents, deterministic (value DESC,
    user_id) rank over USER AGGREGATES (distinct users, never raw
    events), k = ceil(n/10), share = cum_at_k·1e6 DIV total.
    Two-pass range-partitioned rank over the pinned frame from
    :func:`_pareto_ranked_part`."""
    part = _pareto_ranked_part(spark, sf)
    pstats = (part.groupBy("_pid", "event_type")
              .agg(F.count("*").alias("_c"), F.sum("v").alias("_s")))
    woff = (Window.partitionBy("event_type").orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (pstats
            .withColumn("_coff",
                        F.coalesce(F.sum("_c").over(woff), F.lit(0)))
            .withColumn("_soff",
                        F.coalesce(F.sum("_s").over(woff), F.lit(0)))
            .select("_pid", "event_type", "_coff", "_soff"))
    totals = (pstats.groupBy("event_type")
              .agg(F.sum("_c").alias("_n"), F.sum("_s").alias("_tot")))
    wl = (Window.partitionBy("_pid", "event_type")
          .orderBy(F.desc("v"), F.asc("user_id")))
    wlc = wl.rowsBetween(Window.unboundedPreceding, 0)
    staged = (part
              .join(F.broadcast(offs), ["_pid", "event_type"])
              .join(F.broadcast(totals), "event_type")
              .withColumn("_rn",
                          F.row_number().over(wl) + F.col("_coff"))
              .withColumn("_cum", F.sum("v").over(wlc) + F.col("_soff")))
    return (staged.filter(F.col("_rn") == F.expr("(_n + 9) DIV 10"))
            .select("event_type",
                    F.col("_n").cast("long").alias("n_users"),
                    F.col("_rn").cast("long").alias("top_users"),
                    F.col("_tot").cast("long").alias("total_e2"),
                    F.col("_cum").cast("long").alias("top_value_e2"),
                    F.expr("_cum * 1000000L DIV greatest(_tot, 1L)")
                    .cast("long").alias("top_share_e6")))


QUERIES["value_pareto_by_type"] = value_pareto_by_type

ORACLES["value_pareto_by_type"] = """
    WITH per_u AS (
      SELECT event_type, user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY event_type, user_id
    ), staged AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v DESC, user_id) AS rn,
             SUM(v) OVER (PARTITION BY event_type
                          ORDER BY v DESC, user_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(v) OVER (PARTITION BY event_type) AS tot
      FROM per_u
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_users,
           CAST(rn AS BIGINT) AS top_users,
           CAST(tot AS BIGINT) AS total_e2,
           CAST(cum AS BIGINT) AS top_value_e2,
           CAST(cum * 1000000 // greatest(tot, 1) AS BIGINT)
             AS top_share_e6
    FROM staged WHERE rn = (n + 9) // 10
"""


def customer_reorder_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Customer REORDER latency by market segment (B92) — the
    purchase-cycle profile B86 (ship latency) and B84 (event
    interarrival) both miss: per segment, the exact p50/p90 and
    exact-integer mean of the day gaps between a customer's
    CONSECUTIVE orders — how long a segment waits before re-buying,
    the replenishment number an inventory/retention owner plans on.
    Gaps from a per-customer window over order dates (partitions =
    one customer's orders — bounded, parallel at any scale; never a
    global sort); quantiles by the count-frequency closed form over
    the bounded distinct day-gap values per segment (the B58/B86
    discipline): p50 = min g with 2·cum ≥ n, p90 = min g with
    10·cum ≥ 9n.  Deterministic tie order (o_orderdate, o_orderkey)
    makes same-day reorders exact-zero gaps in both engines."""
    t = load(spark, sf, "orders", "customer")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                 "o_orderkey")
    gaps = (t["orders"]
            .withColumn("_prev", F.lag("o_orderdate").over(wo))
            .filter(F.col("_prev").isNotNull())
            .select("o_custkey",
                    F.datediff(F.col("o_orderdate").cast("date"),
                               F.col("_prev").cast("date"))
                    .cast("long").alias("g")))
    seg = t["customer"].select(F.col("c_custkey").alias("o_custkey"),
                               F.col("c_mktsegment").alias("mktsegment"))
    byg = (gaps.join(seg, "o_custkey")
           .groupBy("mktsegment", "g")
           .agg(F.count("*").alias("cnt")))
    wc = (Window.partitionBy("mktsegment").orderBy("g")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("mktsegment")
    staged = (byg.withColumn("_cum", F.sum("cnt").over(wc))
              .withColumn("_n", F.sum("cnt").over(wt)))
    return (staged.groupBy("mktsegment")
            .agg(F.max("_n").cast("long").alias("n_gaps"),
                 F.expr("SUM(g * cnt) * 100 DIV MAX(_n)").cast("long")
                 .alias("mean_gap_days_e2"),
                 F.min(F.when(F.col("_cum") * 2 >= F.col("_n"),
                              F.col("g"))).cast("long").alias("p50_days"),
                 F.min(F.when(F.col("_cum") * 10 >= 9 * F.col("_n"),
                              F.col("g"))).cast("long")
                 .alias("p90_days")))


QUERIES["customer_reorder_latency"] = customer_reorder_latency

ORACLES["customer_reorder_latency"] = """
    WITH gaps AS (
      SELECT o_custkey,
             datediff('day',
               CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS g
      FROM orders
    ), byg AS (
      SELECT c.c_mktsegment AS mktsegment, g, COUNT(*) AS cnt
      FROM gaps JOIN customer c ON gaps.o_custkey = c.c_custkey
      WHERE g IS NOT NULL
      GROUP BY 1, 2
    ), staged AS (
      SELECT mktsegment, g, cnt,
             SUM(cnt) OVER (PARTITION BY mktsegment ORDER BY g
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY mktsegment) AS n
      FROM byg
    )
    SELECT mktsegment,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(SUM(g * cnt) * 100 // MAX(n) AS BIGINT)
             AS mean_gap_days_e2,
           CAST(MIN(CASE WHEN cum * 2 >= n THEN g END) AS BIGINT)
             AS p50_days,
           CAST(MIN(CASE WHEN cum * 10 >= 9 * n THEN g END) AS BIGINT)
             AS p90_days
    FROM staged GROUP BY mktsegment
"""


def session_gap_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization GAP calibration (B93) — the measured-sweep
    discipline (C100/C178/C207) applied to the one free parameter
    every session metric in the suite inherits: at gap ∈ {15, 30,
    60} minutes, how many sessions the SAME event stream splits
    into, how many users have multi-session days, and the mean
    events per session — the table an analytics owner reads before
    pinning the gap that defines B4/B44/B74's sessions.  One
    per-user ordered window computes every inter-event gap ONCE;
    each sweep arm is then a pure aggregate over the shared gap
    frame (sessions = users + gaps-over-threshold — the classic
    identity, no per-arm re-sort).  Exact integers; minute gaps
    floor from micros identically in both engines."""
    ev = load(spark, sf, "events")["events"]
    # exact integer DIV (r13 ADVICE): float-divide-then-cast matched
    # the oracle's // only because session gaps are non-negative —
    # an undocumented invariant.  Spark DIV and DuckDB // both
    # truncate toward zero (-7 DIV 2 == -7//2 == -3), so integer DIV
    # on both sides makes the law identical by construction.
    gap_min = F.expr(
        "(unix_micros(ts) - unix_micros(lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id))) DIV 60000000")
    base = (ev.select("user_id", gap_min.alias("_g"))
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("_n_ev"),
                 *[F.sum((F.col("_g") > g).cast("long"))
                   .alias(f"_over{g}") for g in (15, 30, 60)]))
    arms = []
    for g in (15, 30, 60):
        arms.append(base.agg(
            F.lit(g).cast("long").alias("gap_min"),
            F.count("*").cast("long").alias("n_users"),
            (F.count("*") + F.sum(f"_over{g}")).cast("long")
            .alias("n_sessions"),
            F.sum((F.col(f"_over{g}") > 0).cast("long")).cast("long")
            .alias("n_multi_session_users"),
            F.expr(f"SUM(_n_ev) * 100 DIV (COUNT(*) + SUM(_over{g}))")
            .cast("long").alias("mean_events_per_session_e2")))
    return arms[0].unionByName(arms[1]).unionByName(arms[2])


QUERIES["session_gap_sweep"] = session_gap_sweep

ORACLES["session_gap_sweep"] = """
    WITH g AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)))
             // 60000000 AS gap
      FROM events
    ), per AS (
      SELECT user_id, COUNT(*) AS n_ev,
             SUM(CASE WHEN gap > 15 THEN 1 ELSE 0 END) AS o15,
             SUM(CASE WHEN gap > 30 THEN 1 ELSE 0 END) AS o30,
             SUM(CASE WHEN gap > 60 THEN 1 ELSE 0 END) AS o60
      FROM g GROUP BY user_id
    )
    SELECT CAST(15 AS BIGINT) AS gap_min,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) + SUM(o15) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN o15 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_session_users,
           CAST(SUM(n_ev) * 100 // (COUNT(*) + SUM(o15)) AS BIGINT)
             AS mean_events_per_session_e2
    FROM per
    UNION ALL
    SELECT 30, CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) + SUM(o30) AS BIGINT),
           CAST(SUM(CASE WHEN o30 > 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(n_ev) * 100 // (COUNT(*) + SUM(o30)) AS BIGINT)
    FROM per
    UNION ALL
    SELECT 60, CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) + SUM(o60) AS BIGINT),
           CAST(SUM(CASE WHEN o60 > 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(n_ev) * 100 // (COUNT(*) + SUM(o60)) AS BIGINT)
    FROM per
"""


def referential_integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Foreign-key ORPHAN audit across the star schema (B94) — the
    data-quality gate a 100 TB lake runs before trusting any join
    result: per FK edge, total child rows, rows whose parent key is
    MISSING (orphans a join silently drops), and the orphan share.
    Four edges: lineitem→orders, orders→customer, customer→nation,
    supplier→nation.  A zero row is the healthy answer — the audit's
    value is proving it stays zero as ingest evolves (goka parity:
    the processor's input-topic/table co-partition validation,
    view.go's key-presence contract).  Scale shape: each edge is one
    LEFT join probing the parent key set — bounded parents broadcast
    by AQE, the two fact edges shuffle on their natural keys and AQE
    co-partitions; counts combine map-side."""
    t = load(spark, sf, "customer", "supplier", "orders", "lineitem",
             "nation")
    edges = [
        ("lineitem->orders", t["lineitem"].select(
            F.col("l_orderkey").alias("_k")),
         t["orders"].select(F.col("o_orderkey").alias("_p"))),
        ("orders->customer", t["orders"].select(
            F.col("o_custkey").alias("_k")),
         t["customer"].select(F.col("c_custkey").alias("_p"))),
        ("customer->nation", t["customer"].select(
            F.col("c_nationkey").alias("_k")),
         t["nation"].select(F.col("n_nationkey").alias("_p"))),
        ("supplier->nation", t["supplier"].select(
            F.col("s_nationkey").alias("_k")),
         t["nation"].select(F.col("n_nationkey").alias("_p"))),
    ]
    arms = []
    for name, child, parent in edges:
        arms.append(
            child.join(parent.distinct(),
                       child["_k"] == parent["_p"], "left")
            .agg(F.lit(name).alias("fk_edge"),
                 F.count("*").cast("long").alias("n_rows"),
                 F.sum(F.col("_p").isNull().cast("long")).cast("long")
                 .alias("n_orphans"))
            .select("fk_edge", "n_rows", "n_orphans",
                    F.expr("n_orphans * 1000000L DIV n_rows")
                    .cast("long").alias("orphan_share_e6")))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


QUERIES["referential_integrity_audit"] = referential_integrity_audit

ORACLES["referential_integrity_audit"] = """
    SELECT 'lineitem->orders' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS orphan_share_e6
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT)
    FROM orders o2 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o2.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT)
    FROM customer c2
    LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
      ON c2.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'supplier->nation', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n2.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN n2.n_nationkey IS NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT)
    FROM supplier s
    LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n2
      ON s.s_nationkey = n2.n_nationkey
"""


def stream_disorder_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time DISORDER audit (B95) — the watermark-sizing table:
    Structured Streaming's lateness tolerance (and goka's stream
    ordering contract, partition_processor.go's offset-vs-event-time
    gap) has to be PICKED from data, and this is the data: per event
    type, how many events arrive with an event-time EARLIER than the
    running per-user maximum (arrival order = event_id, the ingest
    sequence), the worst backward jump in minutes, and the p90 jump
    — set the watermark at the observed tail and the dropped-late
    share is known in advance.  Scale shape: the running max is a
    per-USER window (bounded partitions, parallel at any scale —
    never a global arrival sort); jump quantiles by count-frequency
    over bounded distinct minute values per type (the B58/B86/B92
    discipline)."""
    ev = load(spark, sf, "events")["events"]
    # integer DIV (r13 ADVICE): the float-divide-then-cast truncation
    # agreed with the oracle's // only because negative jumps are
    # masked by the _j > 0 late test downstream; DIV (truncate, same
    # as DuckDB //) removes the hidden invariant.  prev-max over the
    # per-user arrival order (event_id), as before.
    jump = F.expr(
        "(max(unix_micros(ts)) OVER (PARTITION BY user_id "
        "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING) - unix_micros(ts)) DIV 60000000")
    base = (ev.select("event_type", jump.alias("_j"))
            .withColumn("_late", F.coalesce(F.col("_j") > 0,
                                            F.lit(False))))
    byj = (base.filter(F.col("_late"))
           .groupBy("event_type", "_j").agg(F.count("*").alias("cnt")))
    wc = (Window.partitionBy("event_type").orderBy("_j")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    q = (byj.withColumn("_cum", F.sum("cnt").over(wc))
         .withColumn("_n", F.sum("cnt").over(wt))
         .groupBy("event_type")
         .agg(F.max("_j").cast("long").alias("max_backjump_min"),
              F.min(F.when(F.col("_cum") * 10 >= 9 * F.col("_n"),
                           F.col("_j"))).cast("long")
              .alias("p90_backjump_min")))
    tot = (base.groupBy("event_type")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.sum(F.col("_late").cast("long")).cast("long")
                .alias("n_out_of_order")))
    return (tot.join(q, "event_type", "left")
            .select("event_type", "n_events", "n_out_of_order",
                    F.expr("n_out_of_order * 1000000L DIV n_events")
                    .cast("long").alias("disorder_share_e6"),
                    F.coalesce("max_backjump_min", F.lit(0))
                    .cast("long").alias("max_backjump_min"),
                    F.coalesce("p90_backjump_min", F.lit(0))
                    .cast("long").alias("p90_backjump_min")))


QUERIES["stream_disorder_audit"] = stream_disorder_audit

ORACLES["stream_disorder_audit"] = """
    WITH j AS (
      SELECT event_type,
             (MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) - epoch_us(ts)) // 60000000 AS jmp
      FROM events
    ), base AS (
      SELECT event_type, jmp,
             COALESCE(jmp > 0, FALSE) AS late
      FROM j
    ), byj AS (
      SELECT event_type, jmp, COUNT(*) AS cnt
      FROM base WHERE late GROUP BY event_type, jmp
    ), staged AS (
      SELECT event_type, jmp, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY jmp
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM byj
    ), q AS (
      SELECT event_type, MAX(jmp) AS mx,
             MIN(CASE WHEN cum * 10 >= 9 * n THEN jmp END) AS p90
      FROM staged GROUP BY event_type
    ), tot AS (
      SELECT event_type, COUNT(*) AS n_events,
             SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_out
      FROM base GROUP BY event_type
    )
    SELECT tot.event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_out AS BIGINT) AS n_out_of_order,
           CAST(n_out * 1000000 // n_events AS BIGINT)
             AS disorder_share_e6,
           CAST(COALESCE(q.mx, 0) AS BIGINT) AS max_backjump_min,
           CAST(COALESCE(q.p90, 0) AS BIGINT) AS p90_backjump_min
    FROM tot LEFT JOIN q USING (event_type)
"""


def value_weighted_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """VALUE-weighted quantiles per event type (B96) — the
    revenue-percentile twin of B86's count quantiles: the "median
    dollar" (the value level at or below which half the TYPE'S TOTAL
    VALUE sits) and its p90, beside the plain count-median.  Skewed
    monetization makes these diverge hard — a type whose count-p50
    is $3 but value-p50 is $200 earns its money from whales, and a
    cap/anomaly policy keyed on count quantiles would miss every
    dollar that matters.  Same count-frequency closed form as
    B58/B86 (cumulative sums over the bounded distinct cent values
    per type — never a row sort): vw_p50 = min v with 2·cum_w ≥
    tot_w where w = v·cnt; exact integer cents throughout."""
    ev = load(spark, sf, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    byv = (ev.groupBy(F.col("event_type"), cents.alias("v"))
           .agg(F.count("*").alias("cnt")))
    wc = (Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    staged = (byv
              .withColumn("_w", F.col("v") * F.col("cnt"))
              .withColumn("_cum", F.sum("cnt").over(wc))
              .withColumn("_cumw", F.sum("_w").over(wc))
              .withColumn("_n", F.sum("cnt").over(wt))
              .withColumn("_tw", F.sum("_w").over(wt)))
    return (staged.groupBy("event_type")
            .agg(F.max("_n").cast("long").alias("n_events"),
                 F.max("_tw").cast("long").alias("total_e2"),
                 F.min(F.when(F.col("_cum") * 2 >= F.col("_n"),
                              F.col("v"))).cast("long").alias("p50_e2"),
                 F.min(F.when(F.col("_cumw") * 2 >= F.col("_tw"),
                              F.col("v"))).cast("long")
                 .alias("vw_p50_e2"),
                 F.min(F.when(F.col("_cumw") * 10 >= 9 * F.col("_tw"),
                              F.col("v"))).cast("long")
                 .alias("vw_p90_e2")))


QUERIES["value_weighted_quantiles"] = value_weighted_quantiles

ORACLES["value_weighted_quantiles"] = """
    WITH byv AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), staged AS (
      SELECT event_type, v, cnt, v * cnt AS w,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(v * cnt) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(cnt) OVER (PARTITION BY event_type) AS n,
             SUM(v * cnt) OVER (PARTITION BY event_type) AS tw
      FROM byv
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(tw) AS BIGINT) AS total_e2,
           CAST(MIN(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT)
             AS p50_e2,
           CAST(MIN(CASE WHEN cumw * 2 >= tw THEN v END) AS BIGINT)
             AS vw_p50_e2,
           CAST(MIN(CASE WHEN cumw * 10 >= 9 * tw THEN v END)
                AS BIGINT) AS vw_p90_e2
    FROM staged GROUP BY event_type
"""


def nation_supplier_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier revenue CONCENTRATION per nation (B97) — the
    Herfindahl–Hirschman index beside B81/B91's Gini/Pareto family,
    on the SUPPLY side none of them cover: per supplier nation, how
    concentrated discounted lineitem revenue is across its suppliers
    (HHI = Σ share², the antitrust/market-structure standard; 10⁶ =
    monopoly, 10⁶/n = perfect split), plus the top supplier's share.
    A procurement owner reads this as single-source risk.  Exact
    integers: per-item cents, share_e6 by DIV, hhi_e6 = Σ share_e6²
    DIV 10⁶ — both engines replicate the same truncation.  Shape:
    lineitem⋈supplier on the fact key (AQE's call — supplier is
    SF-proportional), nation broadcast by hint, two hash-aggs over
    (nation, supplier) then nation."""
    t = load(spark, sf, "lineitem", "supplier", "nation")
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("long")
    per_s = (t["lineitem"]
             .join(t["supplier"],
                   F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(t["nation"]),
                   F.col("s_nationkey") == F.col("n_nationkey"))
             .groupBy(F.col("n_name").alias("nation"),
                      F.col("s_suppkey"))
             .agg(F.sum(cents).alias("_rev")))
    # per-nation totals as a nation-count-sized broadcast back (the
    # B89 pattern) — NOT a Window.partitionBy(nation) over the
    # supplier-level frame: suppliers are SF-proportional (10k/SF),
    # and a per-nation window would funnel every nation's suppliers
    # through one sort task at 100 TB
    totals = per_s.groupBy("nation").agg(F.sum("_rev").alias("_tot"))
    shares = (per_s.join(F.broadcast(totals), "nation")
              .withColumn("_share_e6",
                          F.expr("_rev * 1000000L DIV _tot")))
    return (shares.groupBy("nation")
            .agg(F.count("*").cast("long").alias("n_suppliers"),
                 F.max("_tot").cast("long").alias("revenue_e2"),
                 F.max("_share_e6").cast("long").alias("top_share_e6"),
                 F.expr("SUM(_share_e6 * _share_e6) DIV 1000000")
                 .cast("long").alias("hhi_e6")))


QUERIES["nation_supplier_hhi"] = nation_supplier_hhi

ORACLES["nation_supplier_hhi"] = """
    WITH per_s AS (
      SELECT n_name AS nation, s_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ), shares AS (
      SELECT nation, rev,
             SUM(rev) OVER (PARTITION BY nation) AS tot,
             rev * 1000000 // SUM(rev) OVER (PARTITION BY nation)
               AS share_e6
      FROM per_s
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(tot) AS BIGINT) AS revenue_e2,
           CAST(MAX(share_e6) AS BIGINT) AS top_share_e6,
           CAST(SUM(share_e6 * share_e6) // 1000000 AS BIGINT)
             AS hhi_e6
    FROM shares GROUP BY nation
"""


def scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 intervals from the event
    changelog (B98) — the warehouse materialization of goka's table
    semantics (partition_table.go: a key's state is the fold of its
    update stream; the changelog IS the history): treating each
    user's event_type stream as a state variable, collapse
    consecutive same-state runs (gaps-and-islands: the difference of
    two per-user row_numbers labels each run) and emit one validity
    interval per run — state, version (1-based run index),
    valid_from/valid_to as epoch-micros (valid_to NULL on the
    current run), events inside the run, is_current.  This is the
    point-in-time join table every "what was the user's segment when
    the order happened" question needs.  Scale: every window is
    per-user (bounded partitions); one exchange on user_id reused by
    all four window passes (same key), output linear in runs."""
    ev = load(spark, sf, "events")["events"]
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = (Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id"))
    runs = (ev.select("user_id",
                      F.col("event_type").alias("state"),
                      F.unix_micros("ts").alias("_us"),
                      (F.row_number().over(wo)
                       - F.row_number().over(
                           ws.orderBy("ts", "event_id"))).alias("_isl"))
            .groupBy("user_id", "state", "_isl")
            .agg(F.min("_us").alias("valid_from_us"),
                 F.count("*").cast("long").alias("n_events")))
    wv = Window.partitionBy("user_id").orderBy("valid_from_us")
    return (runs
            .withColumn("version",
                        F.row_number().over(wv).cast("long"))
            .withColumn("valid_to_us",
                        F.lead("valid_from_us").over(wv))
            .select("user_id", "state", "version",
                    F.col("valid_from_us").cast("long"),
                    F.col("valid_to_us").cast("long"),
                    "n_events",
                    F.col("valid_to_us").isNull().alias("is_current")))


QUERIES["scd2_intervals"] = scd2_intervals

ORACLES["scd2_intervals"] = """
    WITH base AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS isl
      FROM events
    ), runs AS (
      SELECT user_id, state, isl,
             MIN(us) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM base GROUP BY user_id, state, isl
    )
    SELECT user_id, state,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY valid_from_us)
                AS BIGINT) AS version,
           CAST(valid_from_us AS BIGINT) AS valid_from_us,
           CAST(LEAD(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY valid_from_us)
                AS BIGINT) AS valid_to_us,
           n_events,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) IS NULL
             AS is_current
    FROM runs
"""


def incremental_agg_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    """Changelog-driven INCREMENTAL aggregate maintenance proof
    (B99) — goka's recovery contract (partition_table.go: replaying
    the changelog's deltas rebuilds the exact table state) applied at
    the query layer, and the algebra the 100 TB architecture rests
    on: a group table maintained by merging per-epoch PARTIAL
    aggregates must equal the full rebuild, or incremental ingest
    silently drifts.  Epochs are ten-day event-time windows (the
    ingest batches); per (epoch, type) partials — count + exact-cent
    sum + min/max event id, every one a commutative monoid — merge
    per type and sit beside the from-scratch rebuild with per-column
    consistency flags.  The HLL twin of this proof is C205
    (register-max merge); this is the plain-aggregate half.  Scale:
    partials combine map-side; the merge aggregates an
    (epochs × types)-sized frame — nothing rescans the fact."""
    ev = load(spark, sf, "events")["events"]
    cents = F.round(F.col("value") * 100).cast("long")
    epoch = F.expr("(unix_micros(ts) DIV 86400000000) DIV 10")
    partials = (ev.groupBy(epoch.alias("_ep"),
                           F.col("event_type"))
                .agg(F.count("*").alias("_c"), F.sum(cents).alias("_s"),
                     F.min("event_id").alias("_mn"),
                     F.max("event_id").alias("_mx")))
    merged = (partials.groupBy("event_type")
              .agg(F.count("*").cast("long").alias("n_epochs"),
                   F.sum("_c").cast("long").alias("cnt_merged"),
                   F.sum("_s").cast("long").alias("sum_merged_e2"),
                   F.min("_mn").cast("long").alias("min_id_merged"),
                   F.max("_mx").cast("long").alias("max_id_merged")))
    full = (ev.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("cnt_full"),
                 F.sum(cents).cast("long").alias("sum_full_e2"),
                 F.min("event_id").cast("long").alias("min_id_full"),
                 F.max("event_id").cast("long").alias("max_id_full")))
    return (merged.join(full, "event_type")
            .select("event_type", "n_epochs",
                    "cnt_merged", "cnt_full",
                    "sum_merged_e2", "sum_full_e2",
                    "min_id_merged", "max_id_merged",
                    ((F.col("cnt_merged") == F.col("cnt_full"))
                     & (F.col("sum_merged_e2") == F.col("sum_full_e2"))
                     & (F.col("min_id_merged") == F.col("min_id_full"))
                     & (F.col("max_id_merged") == F.col("max_id_full")))
                    .alias("consistent")))


QUERIES["incremental_agg_maintenance"] = incremental_agg_maintenance

ORACLES["incremental_agg_maintenance"] = """
    WITH partials AS (
      SELECT (epoch_us(ts) // 86400000000) // 10 AS ep, event_type,
             COUNT(*) AS c,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
             MIN(event_id) AS mn, MAX(event_id) AS mx
      FROM events GROUP BY 1, 2
    ), merged AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_epochs,
             CAST(SUM(c) AS BIGINT) AS cnt_merged,
             CAST(SUM(s) AS BIGINT) AS sum_merged_e2,
             CAST(MIN(mn) AS BIGINT) AS min_id_merged,
             CAST(MAX(mx) AS BIGINT) AS max_id_merged
      FROM partials GROUP BY event_type
    ), fullb AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt_full,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_full_e2,
             CAST(MIN(event_id) AS BIGINT) AS min_id_full,
             CAST(MAX(event_id) AS BIGINT) AS max_id_full
      FROM events GROUP BY event_type
    )
    SELECT merged.event_type, n_epochs, cnt_merged, cnt_full,
           sum_merged_e2, sum_full_e2, min_id_merged, max_id_merged,
           cnt_merged = cnt_full AND sum_merged_e2 = sum_full_e2
             AND min_id_merged = min_id_full
             AND max_id_merged = max_id_full AS consistent
    FROM merged JOIN fullb ON merged.event_type = fullb.event_type
"""


def watermark_drop_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark DROP-RATE calibration (B100) — the sweep that turns
    B95's disorder audit into the actual knob setting: replaying the
    stream in arrival order (event_id, the ingest sequence), how many
    events a Structured-Streaming watermark of 0/5/15 minutes would
    drop (event-time < running-max-event-time − delay at arrival),
    and how many (type × hour-window) aggregate groups those drops
    would silently corrupt.  B95 reports the disorder tail per type;
    this prices each candidate delay in lost events and touched
    windows — read the table, pick the delay, know the cost.  The
    running GLOBAL prefix-max is the two-pass range-partitioned
    kernel (the _global_prefix_sum / B91 discipline — never a
    single-task global window): range-partition by event_id (pinned
    with an eager localCheckpoint so both passes see one layout),
    per-partition max → exclusive prefix-max offsets over the
    partition-count-sized frame, broadcast back, local window
    finishes.  All three delay arms read ONE staged frame in ONE
    aggregate (stack unpivots), exact integers throughout."""
    ev = load(spark, sf, "events")["events"]
    base = ev.select("event_id", "event_type",
                     F.unix_micros("ts").alias("_us"))
    part = (base.repartitionByRange("event_id")
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    pstats = part.groupBy("_pid").agg(F.max("_us").alias("_pm"))
    woff = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (pstats.withColumn("_om", F.max("_pm").over(woff))
            .select("_pid", "_om"))
    wloc = (Window.partitionBy("_pid").orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    staged = (part.join(F.broadcast(offs), "_pid")
              .withColumn("_lm", F.max("_us").over(wloc))
              .withColumn("_wm", F.greatest(F.coalesce("_lm", F.lit(-1)),
                                            F.coalesce("_om", F.lit(-1))))
              .withColumn("_hr", F.expr("_us DIV 3600000000")))

    def dropped(wmin: int):
        return ((F.col("_wm") >= 0)
                & (F.col("_us") < F.col("_wm") - wmin * 60_000_000))

    grp = F.concat_ws("|", F.col("event_type"),
                      F.col("_hr").cast("string"))
    agg = staged.agg(
        F.count("*").alias("_n"),
        *[F.sum(dropped(w).cast("long")).alias(f"_d{w}")
          for w in (0, 5, 15)],
        *[F.count_distinct(F.when(dropped(w), grp)).alias(f"_g{w}")
          for w in (0, 5, 15)])
    return (agg.selectExpr(
        "stack(3, 0L, _n, _d0, _g0, 5L, _n, _d5, _g5,"
        " 15L, _n, _d15, _g15)"
        " AS (wm_min, n_events, n_dropped, n_groups_affected)")
        .select("wm_min", F.col("n_events").cast("long"),
                F.col("n_dropped").cast("long"),
                F.expr("n_dropped * 1000000L DIV n_events")
                .cast("long").alias("drop_share_e6"),
                F.col("n_groups_affected").cast("long")))


QUERIES["watermark_drop_sweep"] = watermark_drop_sweep

ORACLES["watermark_drop_sweep"] = """
    WITH base AS (
      SELECT event_type, epoch_us(ts) AS us,
             COALESCE(MAX(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) AS wm
      FROM events
    ), f AS (
      SELECT event_type, us, wm, us // 3600000000 AS hr
      FROM base
    ), a AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN wm >= 0 AND us < wm THEN 1 ELSE 0 END)
               AS d0,
             SUM(CASE WHEN wm >= 0 AND us < wm - 300000000
                 THEN 1 ELSE 0 END) AS d5,
             SUM(CASE WHEN wm >= 0 AND us < wm - 900000000
                 THEN 1 ELSE 0 END) AS d15,
             COUNT(DISTINCT CASE WHEN wm >= 0 AND us < wm
               THEN event_type || '|' || CAST(hr AS VARCHAR) END)
               AS g0,
             COUNT(DISTINCT CASE WHEN wm >= 0
               AND us < wm - 300000000
               THEN event_type || '|' || CAST(hr AS VARCHAR) END)
               AS g5,
             COUNT(DISTINCT CASE WHEN wm >= 0
               AND us < wm - 900000000
               THEN event_type || '|' || CAST(hr AS VARCHAR) END)
               AS g15
      FROM f
    )
    SELECT CAST(wm_min AS BIGINT) AS wm_min,
           CAST(n AS BIGINT) AS n_events,
           CAST(d AS BIGINT) AS n_dropped,
           CAST(d * 1000000 // n AS BIGINT) AS drop_share_e6,
           CAST(g AS BIGINT) AS n_groups_affected
    FROM (
      SELECT 0 AS wm_min, n, d0 AS d, g0 AS g FROM a
      UNION ALL SELECT 5, n, d5, g5 FROM a
      UNION ALL SELECT 15, n, d15, g15 FROM a
    )
"""


def event_transition_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral PREDICTABILITY per event type (B101) — the
    information-theoretic rollup of B43's transition matrix (and the
    event-stream twin of C120's text bigram entropy): per from-type,
    the Shannon entropy of the successor distribution H(next|from) —
    near 0 = deterministic flows (every view is followed by the same
    step: rigid funnels, or bot traffic), near ln(k) = uniform
    successor mix — beside the modal successor share.  Reuses the
    TransitionSink kernel (same (ts, event_id) total order, stream ≡
    batch by shared code) and the word_entropy float discipline:
    each c·ln c term integerized ONCE to micro-nats, per-type sums
    exact integers, one deterministic closing double expression.
    Scale: one user_id exchange for the lead window, one
    (type,type)-keyed hash-agg (map-side combined), then a
    types²-bounded aggregate."""
    from goka_spark.operators.windows import event_transition_counts

    ev = load(spark, sf, "events")["events"]
    cnt = event_transition_counts(ev, "user_id", "ts", "event_type",
                                  id_col="event_id")
    term_e6 = F.floor(1e6 * F.col("cnt") * F.log(F.col("cnt"))
                      + 0.5).cast("long")
    per = (cnt.groupBy("event_type")
           .agg(F.sum("cnt").alias("_n"),
                F.count("*").alias("_k"),
                F.max("cnt").alias("_top"),
                F.sum(term_e6).alias("_clnc_e6")))
    return per.select(
        "event_type",
        F.col("_n").cast("long").alias("n_trans"),
        F.col("_k").cast("long").alias("n_next_types"),
        F.expr("_top * 1000000L DIV _n").cast("long")
        .alias("top_prob_e6"),
        (F.log(F.col("_n"))
         - F.col("_clnc_e6").cast("double") / 1e6 / F.col("_n"))
        .alias("cond_entropy"))


QUERIES["event_transition_entropy"] = event_transition_entropy

ORACLES["event_transition_entropy"] = """
    WITH nx AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
               AS next_event_type
      FROM events
    ), c AS (
      SELECT event_type, next_event_type, COUNT(*) AS cnt
      FROM nx WHERE next_event_type IS NOT NULL
      GROUP BY event_type, next_event_type
    ), per AS (
      SELECT event_type, SUM(cnt) AS n, COUNT(*) AS k,
             MAX(cnt) AS top,
             SUM(CAST(FLOOR(1e6 * cnt * ln(cnt) + 0.5) AS BIGINT))
               AS clnc_e6
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_trans,
           CAST(k AS BIGINT) AS n_next_types,
           CAST(top * 1000000 // n AS BIGINT) AS top_prob_e6,
           ln(n) - CAST(clnc_e6 AS DOUBLE) / 1e6 / n AS cond_entropy
    FROM per
"""
