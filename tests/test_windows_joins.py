"""Window + join-strategy operator unit tests."""

import datetime as dt

from pyspark.sql import functions as F

from goka_spark.operators import windows as W
from goka_spark.operators.joins import as_of_join, copartition, salted_join


def _ts(minute):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_tumbling(spark):
    df = spark.createDataFrame(
        [(_ts(5), "a", 1.0), (_ts(50), "a", 2.0), (_ts(70), "a", 3.0)],
        "ts timestamp, k string, v double")
    out = W.tumbling(df, "ts", "1 hour", ["k"], {"cnt": F.count("*")})
    got = {r.window_start_us: r.cnt for r in out.collect()}
    h0 = int(dt.datetime(2024, 1, 1).timestamp() * 1e6)
    assert got == {h0: 2, h0 + 3600 * 1_000_000: 1}


def test_hopping_membership(spark):
    df = spark.createDataFrame([(_ts(5), "a")], "ts timestamp, k string")
    out = W.hopping(df, "ts", "1 hour", "30 minutes", ["k"], {"cnt": F.count("*")})
    # one event in a 1h/30m hop belongs to exactly 2 windows
    assert out.count() == 2


def test_session_gap(spark):
    df = spark.createDataFrame(
        [(_ts(0), "a"), (_ts(10), "a"), (_ts(55), "a")], "ts timestamp, k string")
    out = W.session(df, "ts", "30 minutes", ["k"], {"cnt": F.count("*")})
    cnts = sorted(r.cnt for r in out.collect())
    assert cnts == [1, 2]


def test_as_of_backward_and_ties(spark):
    left = spark.createDataFrame(
        [("u", _ts(10), 100), ("u", _ts(30), 101), ("v", _ts(5), 102)],
        "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("u", _ts(10), 7), ("u", _ts(10), 8), ("u", _ts(20), 9)],
        "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"], tiebreak="val")
    got = {r.ev: r.asof_val for r in out.collect()}
    # ev=100 at ts10: right rows at ts10 visible, tie → max val (8)
    # ev=101 at ts30: latest right is ts20 → 9; v has no match → None
    assert got == {100: 8, 101: 9, 102: None}


def test_as_of_tolerance(spark):
    left = spark.createDataFrame([("u", _ts(50), 1)], "k string, ts timestamp, ev long")
    right = spark.createDataFrame([("u", _ts(0), 5)], "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"],
                     tolerance=F.expr("INTERVAL 10 MINUTES"))
    assert out.first().asof_val is None


def test_as_of_forward_and_ties(spark):
    """direction='forward' attaches the EARLIEST right row at or
    after each left ts; ties still resolve to the largest tiebreak;
    keys with nothing ahead get null."""
    left = spark.createDataFrame(
        [("u", _ts(10), 100), ("u", _ts(25), 101), ("v", _ts(5), 102)],
        "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("u", _ts(10), 7), ("u", _ts(10), 8), ("u", _ts(20), 9)],
        "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"], tiebreak="val",
                     direction="forward")
    got = {r.ev: r.asof_val for r in out.collect()}
    # ev=100 at ts10: right rows AT ts10 qualify, tie → max val (8)
    # ev=101 at ts25: nothing at or after → None; v: no match → None
    assert got == {100: 8, 101: None, 102: None}


def test_as_of_forward_tolerance(spark):
    left = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(15), 2)],
        "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("u", _ts(20), 5)], "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"], direction="forward",
                     tolerance=F.expr("INTERVAL 10 MINUTES"))
    got = {r.ev: r.asof_val for r in out.collect()}
    # ev=1: match is 20 min ahead > tolerance → nulled; ev=2: 5 min → kept
    assert got == {1: None, 2: 5}


def test_as_of_forward_matches_bruteforce(spark, sf_dir):
    """Forward as-of on the real events table (purchases → next
    click) agrees with a brute-force min-over-qualifiers join."""
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts",
                         F.col("event_id").alias("pid")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("event_id").alias("cid"),
                      F.unix_micros("ts").alias("c_us")))
    out = as_of_join(purchases, clicks, on="user_id", left_ts="ts",
                     right_ts="ts", value_cols=["c_us"],
                     tiebreak="cid", direction="forward")
    got = {r.pid: r.asof_c_us for r in out.collect()}
    brute = (purchases.select("user_id", F.col("ts").alias("p_ts"), "pid")
             .join(clicks.select("user_id", F.col("ts").alias("k_ts"),
                                 "c_us"), "user_id")
             .filter(F.col("k_ts") >= F.col("p_ts"))
             .groupBy("pid")
             .agg(F.min("c_us").alias("c_us")))
    ref = {r.pid: r.c_us for r in brute.collect()}
    for pid, want in ref.items():
        assert got[pid] == want
    assert all(v is None for p, v in got.items() if p not in ref)


def test_as_of_nearest(spark):
    """direction='nearest' picks the closer of the backward/forward
    matches; an exact-distance tie goes to the backward one; one-sided
    keys fall back to whichever side exists."""
    left = spark.createDataFrame(
        [("u", _ts(10), 1),    # back@8 (d=2) vs fwd@20 (d=10) -> 8
         ("u", _ts(19), 2),    # back@8 (d=11) vs fwd@20 (d=1) -> 20
         ("u", _ts(14), 3),    # tie d=6/d=6 -> backward (8)
         ("v", _ts(5), 4),     # only forward exists
         ("w", _ts(5), 5)],    # no matches at all
        "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("u", _ts(8), 80), ("u", _ts(20), 200), ("v", _ts(9), 90)],
        "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"], direction="nearest")
    got = {r.ev: r.asof_val for r in out.collect()}
    assert got == {1: 80, 2: 200, 3: 80, 4: 90, 5: None}


def test_as_of_nearest_tolerance(spark):
    """Tolerance applies per direction before the nearest choice: a
    close forward match wins when the backward one is out of range."""
    left = spark.createDataFrame(
        [("u", _ts(60), 1)], "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("u", _ts(0), 5), ("u", _ts(65), 7)],
        "k string, ts timestamp, val long")
    out = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     value_cols=["val"], direction="nearest",
                     tolerance=F.expr("INTERVAL 10 MINUTES"))
    assert out.first().asof_val == 7


def test_salted_join(spark):
    big = spark.createDataFrame([("k", i) for i in range(100)], "j string, n long")
    small = spark.createDataFrame([("k", "payload")], "j string, p string")
    out = salted_join(big, small, on="j", salt=8)
    assert out.count() == 100
    assert out.select("p").distinct().first().p == "payload"


def test_copartition_same_counts(spark):
    a = spark.range(10).select(F.col("id").cast("string").alias("key"))
    b = spark.range(10).select(F.col("id").cast("string").alias("key"))
    parts = copartition({"a": a, "b": b}, 4)
    assert parts["a"].rdd.getNumPartitions() == 4
    assert parts["b"].rdd.getNumPartitions() == 4


def test_interval_bucket_join_exact_boundaries(spark):
    """Bucketized point-in-interval join returns exactly the rows a
    naive range join would — including points on bucket edges and
    intervals spanning multiple buckets."""
    import datetime as dt

    from goka_spark.operators.joins import interval_bucket_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    points = spark.createDataFrame(
        [(1, 100 + m, ts(m)) for m in (0, 29, 30, 31, 59, 60, 95)],
        "k long, pid long, pts timestamp")
    intervals = spark.createDataFrame(
        [(1, 1, ts(0), ts(30)),     # spans two 30-min buckets
         (1, 2, ts(31), ts(94)),    # spans three buckets
         (2, 3, ts(0), ts(60))],    # different key: never matches
        "k long, iid long, s timestamp, e timestamp")
    got = {(r.iid, r.pid) for r in interval_bucket_join(
        points, intervals, on="k", point_ts="pts", start_ts="s",
        end_ts="e", bucket="30 minutes").collect()}
    expect = {(1, 100), (1, 129), (1, 130),           # 0..30 inclusive
              (2, 131), (2, 159), (2, 160)}           # 31..94
    assert got == expect


def test_interval_join_plan_is_equi_join(spark, sf_dir):
    """The attribution query must plan as an equi-join on the
    (user, bucket) composite — never a nested-loop range join."""
    from goka_spark.plans import explain as X
    from goka_spark.queries.analytics import purchase_click_attribution

    plan = X.simple(purchase_click_attribution(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_histogram_quantiles_within_bin_width(spark, sf_dir):
    """Sketch quantiles land within one bin width of the exact
    interpolated percentiles, and shard sketches merge: the bin
    counts of two halves sum to the whole (exact integer state)."""
    from goka_spark.operators.windows import histogram_quantiles
    from goka_spark.queries.analytics import value_quantiles
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    exact = {r["event_type"]: (r["p50"], r["p90"])
             for r in value_quantiles(spark, sf_dir).collect()}
    sk = {r["event_type"]: (r["p50"], r["p90"])
          for r in histogram_quantiles(
              ev, "value", ["event_type"], 0.0, 512.0, 256).collect()}
    for k, (e50, e90) in exact.items():
        assert abs(sk[k][0] - e50) <= 2.0 + 1e-9
        assert abs(sk[k][1] - e90) <= 2.0 + 1e-9


# --------------------------------------------------------- OhlcSink

def test_streaming_ohlc_equals_batch(spark, sf_dir, tmp_path):
    """Epoch-chunked events through OhlcSink merge to exactly the
    batch ohlc_bars candles — with the epochs deliberately fed OUT of
    time order: the carried (ts, id) order keys let a later epoch's
    earlier event still win the open, the contract TransitionSink
    cannot offer."""
    from goka_spark.operators.windows import OhlcSink
    from goka_spark.queries.analytics import ohlc_bars
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    sink = OhlcSink(str(tmp_path / "ohlc"))
    # 3 epochs by event_id residue — each epoch spans ALL windows, so
    # every candle exercises a real multi-epoch merge; residue order
    # (2, 0, 1) scrambles time order across epochs on purpose
    for i, res in enumerate((2, 0, 1)):
        sink(ev.filter(F.col("event_id") % 3 == res), i)

    cols = ["event_type", "open_e2", "high_e2", "low_e2",
            "close_e2", "volume", "window_start_us"]
    live = sorted(tuple(r[c] for c in cols)
                  for r in sink.read(spark).collect())
    ref = sorted(tuple(r[c] for c in cols)
                 for r in ohlc_bars(spark, sf_dir).collect())
    assert live == ref


def test_ohlc_sink_epoch_retry_idempotent(spark, tmp_path):
    """Re-running an epoch (foreachBatch retry contract) must not
    inflate volume or move open/close: whole-epoch overwrite."""
    from goka_spark.operators.windows import OhlcSink

    from datetime import datetime as dt

    schema = "ts timestamp, event_id long, event_type string, value double"
    sink = OhlcSink(str(tmp_path / "o2"))
    b0 = spark.createDataFrame(
        [(dt(2024, 1, 1, 0, 10), 1, "a", 5.0),
         (dt(2024, 1, 1, 0, 20), 2, "a", 9.0)], schema)
    b1 = spark.createDataFrame(
        [(dt(2024, 1, 1, 0, 5), 3, "a", 7.0)], schema)   # earlier ts!
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)                                   # retry
    row = sink.read(spark).collect()
    assert len(row) == 1
    r = row[0]
    # the later-epoch, earlier-ts event wins the open; volume exact
    assert (r.open_e2, r.high_e2, r.low_e2, r.close_e2, r.volume) == \
        (700, 900, 500, 900, 3)


def test_ohlc_sink_live_stream(spark, tmp_path):
    """OhlcSink under a REAL Structured Streaming query (file source
    + foreachBatch): two appends, merged candles equal one batch pass
    over the union."""
    from datetime import datetime as dt

    from goka_spark.operators.windows import OhlcSink, ohlc_partials
    from goka_spark.streaming.runtime import stream_from_dir

    schema = ("ts timestamp, event_id long, event_type string, "
              "value double")
    rows1 = [(dt(2024, 1, 1, 0, 5), 1, "a", 7.0),
             (dt(2024, 1, 1, 0, 40), 2, "a", 3.0)]
    rows2 = [(dt(2024, 1, 1, 0, 20), 3, "a", 9.5),
             (dt(2024, 1, 1, 1, 10), 4, "a", 1.0)]
    src = str(tmp_path / "topic")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = OhlcSink(str(tmp_path / "ohlc"))
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    union = spark.createDataFrame(rows1 + rows2, schema)
    cols = ["event_type", "open_e2", "high_e2", "low_e2",
            "close_e2", "volume", "window_start_us"]
    ref = sorted(tuple(r[c] for c in cols)
                 for r in ohlc_partials(union).select(*cols).collect())
    live = sorted(tuple(r[c] for c in cols)
                  for r in sink.read(spark).collect())
    assert live == ref
    # the second epoch's 00:20 event sits INSIDE the first epoch's
    # hour-0 candle: open stays epoch-0's 00:05 (700), high comes
    # from epoch-1 (950), close is epoch-0's 00:40 (300)
    hour0 = min(live, key=lambda r: r[6])
    assert (hour0[1], hour0[2], hour0[3], hour0[4], hour0[5]) == \
        (700, 950, 300, 300, 3)


# ------------------------------------------------------ DrawdownSink

def test_streaming_drawdown_equals_batch(spark, sf_dir, tmp_path):
    """Time-ordered epoch chunks through DrawdownSink merge to
    exactly the batch max_drawdown rows — including drawdowns that
    SPAN epochs (a peak in epoch N against a trough in epoch N+k),
    which the cross-boundary peak-minus-min term exists for."""
    from goka_spark.operators.windows import DrawdownSink
    from goka_spark.queries.analytics import max_drawdown
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    # 3 contiguous time slices (the ordered-epoch contract)
    row = ev.selectExpr("percentile(unix_micros(ts), 0.33) AS lo",
                        "percentile(unix_micros(ts), 0.66) AS hi").first()
    lo, hi = int(row.lo), int(row.hi)
    sink = DrawdownSink(str(tmp_path / "dd"))
    us = F.unix_micros("ts")
    sink(ev.filter(us <= lo), 0)
    sink(ev.filter((us > lo) & (us <= hi)), 1)
    sink(ev.filter(us > hi), 2)

    cols = ["key", "n_events", "peak_e2", "max_drawdown_e2"]
    live = sorted(tuple(r[c] for c in cols)
                  for r in sink.read(spark).collect())
    ref = sorted(tuple(r[c] for c in cols)
                 for r in max_drawdown(spark, sf_dir).collect())
    assert live == ref


def test_drawdown_sink_cross_epoch_and_retry(spark, tmp_path):
    """A peak in epoch 0 against a trough in epoch 2 must surface
    (no within-epoch drawdown reaches it), and an epoch retry must
    not change anything."""
    from goka_spark.operators.windows import DrawdownSink
    from datetime import datetime as dt

    schema = ("ts timestamp, event_id long, user_id long, "
              "value double")
    sink = DrawdownSink(str(tmp_path / "d2"))
    mk = lambda m, i, v: (dt(2024, 1, 1, 0, m), i, 1, v)
    sink(spark.createDataFrame([mk(0, 1, 50.0), mk(1, 2, 90.0)],
                               schema), 0)          # peak 9000
    sink(spark.createDataFrame([mk(2, 3, 80.0)], schema), 1)
    b2 = spark.createDataFrame([mk(3, 4, 10.0)], schema)  # trough 1000
    sink(b2, 2)
    sink(b2, 2)                                     # retry
    r = sink.read(spark).collect()[0]
    assert (r.key, r.n_events, r.peak_e2, r.max_drawdown_e2) == \
        ("1", 4, 9000, 8000)


# --------------------------------------------------- SessionizeSink

def _batch_sessions(spark, ev):
    """Reference: the batch 30-min-gap islands as (user, start, end, n)."""
    from pyspark.sql.window import Window as Wnd

    w = Wnd.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = w.rowsBetween(Wnd.unboundedPreceding, 0)
    return (ev.select("user_id", "ts", "event_id")
            .withColumn("_sid", F.sum(new_s).over(run))
            .groupBy("user_id", "_sid")
            .agg(F.min(F.unix_micros("ts")).alias("start_us"),
                 F.max(F.unix_micros("ts")).alias("end_us"),
                 F.count("*").alias("n")))


def test_sessionize_sink_equals_batch(spark, sf_dir, tmp_path):
    """Three time-ordered epoch slices through SessionizeSink yield
    exactly the batch islands — including sessions that SPAN slice
    boundaries, which the open-session state table stitches."""
    from goka_spark.operators.windows import SessionizeSink
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    row = ev.selectExpr("percentile(unix_micros(ts), 0.33) AS lo",
                        "percentile(unix_micros(ts), 0.66) AS hi").first()
    lo, hi = int(row.lo), int(row.hi)
    us = F.unix_micros("ts")
    sink = SessionizeSink(str(tmp_path / "sess"))
    sink(ev.filter(us <= lo), 0)
    sink(ev.filter((us > lo) & (us <= hi)), 1)
    sink(ev.filter(us > hi), 2)

    live = sorted((r.user, r.start_us, r.end_us, r.n)
                  for r in sink.read(spark).collect())
    ref = sorted((r.user_id, r.start_us, r.end_us, r.n)
                 for r in _batch_sessions(spark, ev).collect())
    assert live == ref


def test_sessionize_sink_stitch_close_retry(spark, tmp_path):
    """A session continuing across the boundary inherits its start
    and count; an out-of-gap first event closes the stored session;
    an epoch retry changes nothing."""
    from datetime import datetime as dt

    from goka_spark.operators.windows import SessionizeSink

    schema = "ts timestamp, event_id long, user_id long"
    mk = lambda mi, i, u: (dt(2024, 1, 1, mi // 60, mi % 60), i, u)
    sink = SessionizeSink(str(tmp_path / "s2"))
    # user 1: events at :00 and :10 — session open at epoch end
    # user 2: event at :00 only
    sink(spark.createDataFrame(
        [mk(0, 1, 1), mk(10, 2, 1), mk(0, 3, 2)], schema), 0)
    # user 1 continues at :25 (gap 15m < 30m) — same session;
    # user 2 reappears at :50 (gap 50m) — stored session closes
    b1 = spark.createDataFrame([mk(25, 4, 1), mk(50, 5, 2)], schema)
    sink(b1, 1)
    sink(b1, 1)                                   # retry
    got = {(r.user, r.start_us, r.end_us, r.n)
           for r in sink.read(spark).collect()}
    m = 60_000_000
    epoch0 = 1704067200 * 1_000_000
    assert got == {
        (1, epoch0, epoch0 + 25 * m, 3),          # stitched session
        (2, epoch0, epoch0, 1),                   # closed by the gap
        (2, epoch0 + 50 * m, epoch0 + 50 * m, 1),  # new open session
    }


# ---------------------------------------------------- TransitionSink

def test_streaming_transitions_equal_batch(spark, tmp_path):
    """Three ts-ordered micro-batches through TransitionSink merge to
    exactly the batch transition matrix — including the cross-epoch
    boundary pairs the last-event state table exists for."""
    from goka_spark.operators.windows import (TransitionSink,
                                              event_transition_counts)

    # ts = t // 2 gives same-user TIED timestamps, disambiguated by
    # the event id — the tie case where stream and batch previously
    # could disagree (ADVICE r7)
    rows = [(u, t // 2, u * 100 + t, f"e{(u * 7 + t) % 3}")
            for u in range(5) for t in range(9)]
    schema = "user_id long, ts long, event_id long, event_type string"
    full = spark.createDataFrame(rows, schema)

    sink = TransitionSink(str(tmp_path / "trans"))
    for i, lo in enumerate((0, 3, 6)):   # id-ordered epoch chunks
        chunk = [r for r in rows if lo <= r[2] % 100 < lo + 3]
        sink(spark.createDataFrame(chunk, schema), i)

    live = {(r["event_type"], r["next_event_type"]): (r["cnt"], r["prob_e6"])
            for r in sink.read(spark).collect()}
    cnt = event_transition_counts(full, "user_id", "ts", "event_type",
                                  id_col="event_id")
    tot = {r["event_type"]: r["t"] for r in
           cnt.groupBy("event_type").agg(F.sum("cnt").alias("t")).collect()}
    ref = {(r["event_type"], r["next_event_type"]):
           (r["cnt"], r["cnt"] * 1_000_000 // tot[r["event_type"]])
           for r in cnt.collect()}
    assert live == ref
    # every user contributes len-1 transitions: boundaries included
    assert sum(v[0] for v in live.values()) == 5 * 8


def test_transition_sink_epoch_retry_idempotent(spark, tmp_path):
    """Re-running an epoch (foreachBatch retry contract) must not
    double-count: the epoch directory is overwritten whole."""
    from goka_spark.operators.windows import TransitionSink

    schema = "user_id long, ts long, event_id long, event_type string"
    sink = TransitionSink(str(tmp_path / "t2"))
    b0 = spark.createDataFrame([(1, 0, 0, "a"), (1, 1, 1, "b")], schema)
    b1 = spark.createDataFrame([(1, 2, 2, "c")], schema)
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)                                   # retry
    out = {(r["event_type"], r["next_event_type"]): r["cnt"]
           for r in sink.read(spark).collect()}
    assert out == {("a", "b"): 1, ("b", "c"): 1}


def test_event_cooccurrence_lift_closed_form(spark, tmp_path, monkeypatch):
    """Crafted user×type incidence with a KNOWN non-unit lift (the
    saturated driver corpus pins every pair at exactly 1e6):
    n_a=3, n_b=3, n_ab=2, N=4 → lift = 2·4·1e6 // 9 = 888888,
    support = 500000; the a-only/b-only users prove the distinct
    stage collapses repeats."""
    from goka_spark.queries.analytics import event_cooccurrence_lift
    import goka_spark.queries.analytics as QA
    import goka_spark.queries.base as B

    rows = [(1, 1, "a"), (2, 1, "b"), (3, 1, "a"),   # user 1: both (+repeat)
            (4, 2, "a"),                             # user 2: a only
            (5, 3, "b"),                             # user 3: b only
            (6, 4, "a"), (7, 4, "b")]                # user 4: both
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    out = event_cooccurrence_lift(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_ab) == ("a", "b", 2)
    assert r.support_e6 == 500_000
    assert r.lift_e6 == 2 * 4 * 1_000_000 // (3 * 3)


def test_growth_accounting_lifecycle(spark, tmp_path, monkeypatch):
    """Crafted lifecycles (the saturated driver corpus has every user
    active every week): churn, resurrection, censoring at the last
    week, and the active = new+retained+resurrected identity."""
    from goka_spark.queries.analytics import growth_accounting
    import goka_spark.queries.analytics as QA
    from datetime import datetime

    def ts(week, day=0):
        # week k of 1970 → datetime inside it (day 0 = Thursday epoch)
        return datetime.utcfromtimestamp((week * 7 + day) * 86400)

    rows = [(1, 1, ts(1)), (2, 1, ts(2)), (3, 1, ts(4)),   # gap at 3
            (4, 2, ts(1)),                                  # one-week user
            (5, 3, ts(2)), (6, 3, ts(3)), (7, 3, ts(4))]
    ev = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    got = {r.week: r for r in growth_accounting(spark, "ignored").collect()}
    assert (got[1].n_new, got[1].n_churned, got[1].n_active) == (2, 0, 2)
    assert (got[2].n_new, got[2].n_retained, got[2].n_churned) == (1, 1, 1)
    assert (got[3].n_retained, got[3].n_churned) == (1, 1)   # u1 churns @3
    assert (got[4].n_resurrected, got[4].n_retained) == (1, 1)
    assert 5 not in got                      # censored: max week is 4
    for r in got.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_empty_sinks_read_empty_frames(spark, tmp_path):
    """read() before any epoch was written returns an EMPTY frame
    with the output schema — not AttributeError off a None state
    (r9 ADVICE)."""
    from goka_spark.operators.windows import (GrowthAccountingSink,
                                              SessionizeSink)
    s = SessionizeSink(str(tmp_path / "empty_sess")).read(spark)
    assert s.count() == 0
    assert s.columns == ["user", "start_us", "end_us", "n"]
    g = GrowthAccountingSink(str(tmp_path / "empty_ga")).read(spark)
    assert g.count() == 0
    assert g.columns == ["week", "n_new", "n_retained",
                         "n_resurrected", "n_churned", "n_active"]


# --------------------------------------------- GrowthAccountingSink

def test_growth_sink_equals_batch(spark, sf_dir, tmp_path, monkeypatch):
    """Three time-ordered epoch slices through GrowthAccountingSink
    yield exactly the B73 batch table — including right-censored
    trailing churn, derived at read() time from the state table."""
    from goka_spark.operators.windows import GrowthAccountingSink
    from goka_spark.queries.analytics import growth_accounting
    import goka_spark.queries.analytics as QA
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    row = ev.selectExpr("percentile(unix_micros(ts), 0.33) AS lo",
                        "percentile(unix_micros(ts), 0.66) AS hi").first()
    lo, hi = int(row.lo), int(row.hi)
    us = F.unix_micros("ts")
    sink = GrowthAccountingSink(str(tmp_path / "ga"))
    sink(ev.filter(us <= lo), 0)
    sink(ev.filter((us > lo) & (us <= hi)), 1)
    sink(ev.filter(us > hi), 2)

    live = sorted(tuple(r) for r in sink.read(spark).collect())
    monkeypatch.setattr(QA, "load", lambda s, sf, *t: {"events": ev})
    ref = sorted(tuple(r) for r in growth_accounting(spark, "x").collect())
    assert live == ref


def test_growth_sink_boundary_lifecycle_and_retry(spark, tmp_path):
    """Crafted cross-epoch lifecycles: a user retained across the
    boundary, one churning + resurrecting across it, a week re-seen
    in the next epoch counting nothing, and an epoch retry changing
    nothing."""
    from datetime import datetime as dt, timedelta

    from goka_spark.operators.windows import GrowthAccountingSink

    schema = "user_id long, ts timestamp"
    wk = lambda k, d=0: dt(1970, 1, 1) + timedelta(days=7 * k + d)
    sink = GrowthAccountingSink(str(tmp_path / "ga2"))
    # epoch 0: u1 weeks 1,2; u2 week 1; u3 week 2
    sink(spark.createDataFrame(
        [(1, wk(1)), (1, wk(2)), (2, wk(1)), (3, wk(2))], schema), 0)
    # epoch 1: u1 week 3 (retained across boundary); u2 week 4
    # (resurrected across boundary, churned @2); u3 week 2 AGAIN
    # (re-seen, counts nothing) and week 4 (resurrected, churned @3)
    b1 = spark.createDataFrame(
        [(1, wk(3)), (2, wk(4)), (3, wk(2, 1)), (3, wk(4))], schema)
    sink(b1, 1)
    sink(b1, 1)                                   # retry
    got = {r.week: (r.n_new, r.n_retained, r.n_resurrected,
                    r.n_churned, r.n_active)
           for r in sink.read(spark).collect()}
    assert got[1] == (2, 0, 0, 0, 2)              # u1, u2 new
    assert got[2] == (1, 1, 0, 1, 2)              # u3 new, u1 ret, u2 churn@2
    assert got[3] == (0, 1, 0, 1, 1)              # u1 ret, u3 churn@3
    # u2+u3 resurrect @4; u1 (last wk 3 < max 4) trail-churns @4
    assert got[4] == (0, 0, 2, 1, 2)


def test_activation_correlates_lift(spark, tmp_path, monkeypatch):
    """Crafted cohort where the 'a' behavior genuinely predicts
    retention (the saturated driver corpus pins every lift at 1):
    with-a retention 2/2, without-a 1/3."""
    from goka_spark.queries.analytics import activation_correlates
    import goka_spark.queries.analytics as QA
    from datetime import datetime, timedelta

    wk = lambda k: datetime(1970, 1, 1) + timedelta(days=7 * k)
    rows = [
        (1, "a", wk(0)), (1, "x", wk(1)),     # did a, retained
        (2, "a", wk(0)), (2, "x", wk(1)),     # did a, retained
        (3, "x", wk(0)), (3, "x", wk(1)),     # no a, retained
        (4, "x", wk(0)),                      # no a, churned
        (5, "x", wk(0)),                      # no a, churned
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    got = {r.event_type: r
           for r in activation_correlates(spark, "x").collect()}
    a = got["a"]
    assert (a.n_with, a.ret_with_e6) == (2, 1_000_000)
    assert (a.n_without, a.ret_without_e6) == (3, 333_333)
    assert a.lift_e3 == 1_000_000 * 1000 // 333_333      # ≈3.0×
    # 'x' in week 0: only users 3,4,5 (users 1,2 did x in week 1,
    # which is NOT their first week) — 1/3 retained with, 2/2 without
    x = got["x"]
    assert (x.n_with, x.ret_with_e6) == (3, 333_333)
    assert (x.n_without, x.ret_without_e6) == (2, 1_000_000)


def test_engagement_mix_decile_assignment(spark, tmp_path, monkeypatch):
    """20 users, user k has k events of one type: user 20,19 land in
    decile 1 (rank·10−1 DIV n +1), user 1 in decile 10; per-decile
    shares are exact."""
    from goka_spark.queries.analytics import engagement_mix_by_decile
    import goka_spark.queries.analytics as QA
    from datetime import datetime

    rows = []
    eid = 0
    for u in range(1, 21):
        for i in range(u):
            eid += 1
            rows.append((eid, u, "buy" if u > 10 else "view",
                         datetime(2024, 1, 1)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    got = {(r.decile, r.event_type): (r.n_events, r.share_e6)
           for r in engagement_mix_by_decile(spark, "x").collect()}
    # decile 1 = ranks 1-2 = users 20,19 (both 'buy'): 39 events
    assert got[(1, "buy")] == (39, 1_000_000)
    # decile 10 = ranks 19-20 = users 2,1 ('view'): 3 events
    assert got[(10, "view")] == (3, 1_000_000)
    # decile 5 = ranks 9-10 = users 12,11: 'buy' 23 events
    assert got[(5, "buy")] == (23, 1_000_000)
    # decile 6 = ranks 11-12 = users 10,9: 'view'
    assert got[(6, "view")] == (19, 1_000_000)


def test_seasonal_baseline_sink_equals_batch(spark, sf_dir, tmp_path,
                                             monkeypatch):
    """Three epoch slices through SeasonalBaselineSink score to
    exactly the batch seasonal_anomalies table — additive cell
    partials + the shared scoring kernel."""
    from goka_spark.operators.windows import SeasonalBaselineSink
    from goka_spark.queries.analytics import seasonal_anomalies
    import goka_spark.queries.analytics as QA
    from goka_spark.queries.base import load

    ev = load(spark, sf_dir, "events")["events"]
    row = ev.selectExpr("percentile(unix_micros(ts), 0.33) AS lo",
                        "percentile(unix_micros(ts), 0.66) AS hi").first()
    lo, hi = int(row.lo), int(row.hi)
    us = F.unix_micros("ts")
    sink = SeasonalBaselineSink(str(tmp_path / "sb"))
    # a cell (same type+hour) can SPAN slices: the additive merge
    # must recombine it before scoring
    sink(ev.filter(us <= lo), 0)
    sink(ev.filter((us > lo) & (us <= hi)), 1)
    b2 = ev.filter(us > hi)
    sink(b2, 2)
    sink(b2, 2)                                  # retry
    live = sorted(tuple(r) for r in sink.read(spark).collect())
    monkeypatch.setattr(QA, "load", lambda s, sf, *t: {"events": ev})
    ref = sorted(tuple(r) for r in seasonal_anomalies(spark, "x").collect())
    assert live == ref
