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
    binned = histogram_bins(df, value_col, keys, lo, hi, n_bins)
    return quantiles_from_bins(binned, keys, lo, hi, n_bins, qs)


def histogram_bins(df, value_col: str, keys: list,
                   lo: float, hi: float, n_bins: int = 256):
    """The sketch KERNEL batch and streaming share: exact integer
    (keys, bin) counters over fixed equi-width bins — an associative
    partial that merges across shards/epochs by cell-wise SUM."""
    from pyspark.sql import functions as F

    width = (hi - lo) / n_bins
    b = F.least(F.greatest(
        F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    return (df.select(*keys, b.alias("_bin"))
            .groupBy(*keys, "_bin").agg(F.count("*").alias("_c")))


def quantiles_from_bins(binned, keys: list, lo: float, hi: float,
                        n_bins: int, qs: tuple = (0.5, 0.9)):
    """Inverted-CDF readout over merged bin counters (first bin whose
    cumulative count reaches ceil(q·n)); ≤ n_bins rows per key."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    width = (hi - lo) / n_bins
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


class HistogramSink:
    """Streaming histogram-sketch — the live face of the batch
    ``histogram_quantiles`` query and the SUM-monoid sibling of
    CmsSink (cell-wise SUM) and HllSink (cell-wise MAX): a
    ``foreachBatch`` sink writing each micro-batch's (keys, bin)
    integer counters to ``out_path/epoch_id=N``; ``read()`` merges
    epochs by cell-wise SUM into exactly the batch counters of
    everything seen (associative + commutative, so shard-then-merge
    is exact), and ``quantiles()`` returns the batch query's schema
    — dashboards swap live/batch without changes.  Epoch overwrite
    is retry-idempotent (the ExactlyOnceBatchSink discipline);
    state is ≤ n_bins·|keys| integers per epoch regardless of rows.
    """

    def __init__(self, out_path: str, value_col: str, keys: list,
                 lo: float, hi: float, n_bins: int = 256,
                 qs: tuple = (0.5, 0.9)):
        self.out_path = out_path.rstrip("/")
        self.value_col = value_col
        self.keys = list(keys)
        self.lo, self.hi, self.n_bins, self.qs = lo, hi, n_bins, qs

    def __call__(self, batch_df, epoch_id: int) -> None:
        bins = histogram_bins(batch_df, self.value_col, self.keys,
                              self.lo, self.hi, self.n_bins)
        (bins.write.mode("overwrite")
         .parquet(f"{self.out_path}/epoch_id={int(epoch_id)}"))

    def read(self, spark):
        from pyspark.sql import functions as F

        parts = spark.read.parquet(self.out_path)
        return (parts.groupBy(*self.keys, "_bin")
                .agg(F.sum("_c").alias("_c")))

    def quantiles(self, spark):
        return quantiles_from_bins(self.read(spark), self.keys,
                                   self.lo, self.hi, self.n_bins,
                                   self.qs)


def ohlc_partials(df, ts_col: str = "ts", keys: list = None,
                  value_col: str = "value", id_col: str = "event_id",
                  duration: str = "1 hour"):
    """Mergeable OHLC bars — the kernel the batch ``ohlc_bars`` query
    and the streaming ``OhlcSink`` share: per (keys, window) candle
    with open/close chosen by the deterministic (ts, id) total order,
    PLUS the carried order keys (``_open_ord``/``_close_ord``) that
    make partials a true monoid — two partial candles merge into
    exactly the candle of their union (open = the open of the
    earlier-ordered partial, high/low = max/min, volume = sum), so
    shard-then-merge and epoch-then-merge are exact.  Value
    integerized at e2; ONE windowed hash-agg with map-side combine."""
    keys = ["event_type"] if keys is None else list(keys)
    v_e2 = F.round(F.col(value_col) * 100).cast("long")
    t_us = F.unix_micros(F.col(ts_col))
    ordk = F.struct(F.col(ts_col), F.col(id_col))
    ord_s = F.struct(t_us.alias("us"), F.col(id_col).alias("id"))
    return (df.groupBy(F.window(ts_col, duration).alias("_w"), *keys)
            .agg(F.min_by(v_e2, ordk).alias("open_e2"),
                 F.max(v_e2).alias("high_e2"),
                 F.min(v_e2).alias("low_e2"),
                 F.max_by(v_e2, ordk).alias("close_e2"),
                 F.count("*").alias("volume"),
                 F.min(ord_s).alias("_open_ord"),
                 F.max(ord_s).alias("_close_ord"))
            .withColumn("window_start_us", F.unix_micros(F.col("_w.start")))
            .drop("_w"))


def ohlc_merge(parts, keys: list = None):
    """Merge partial candles (associative + commutative): open/close
    follow the carried (ts, id) order keys, high/low/volume are
    max/min/sum.  Output keeps the partial schema, so merges nest."""
    keys = ["event_type"] if keys is None else list(keys)
    return (parts.groupBy(*keys, "window_start_us")
            .agg(F.min_by("open_e2", "_open_ord").alias("open_e2"),
                 F.max("high_e2").alias("high_e2"),
                 F.min("low_e2").alias("low_e2"),
                 F.max_by("close_e2", "_close_ord").alias("close_e2"),
                 F.sum("volume").alias("volume"),
                 F.min("_open_ord").alias("_open_ord"),
                 F.max("_close_ord").alias("_close_ord"))
            .select(*keys, "open_e2", "high_e2", "low_e2", "close_e2",
                    "volume", "_open_ord", "_close_ord",
                    "window_start_us"))


class OhlcSink:
    """Streaming OHLC candlesticks — the live face of the batch
    ``ohlc_bars`` query (B47) and the carried-order sibling of
    HistogramSink's SUM monoid: each micro-batch's partial candles
    (with their ``_open_ord``/``_close_ord`` order keys) land in
    ``out_path/epoch_id=N``; ``read()`` merges epochs into exactly
    the batch candles of everything seen — the order keys are what
    lets a later epoch's earlier-timestamped event still win the
    open (out-of-order epochs merge correctly; no ordering contract
    needed, unlike TransitionSink).  Epoch overwrite is
    retry-idempotent; state is one row per live (keys, window) per
    epoch."""

    def __init__(self, out_path: str, ts_col: str = "ts",
                 keys: list = None, value_col: str = "value",
                 id_col: str = "event_id", duration: str = "1 hour"):
        self.out = out_path.rstrip("/")
        self.ts_col, self.value_col = ts_col, value_col
        self.id_col, self.duration = id_col, duration
        self.keys = ["event_type"] if keys is None else list(keys)

    def __call__(self, batch_df, epoch_id: int) -> None:
        parts = ohlc_partials(batch_df, self.ts_col, self.keys,
                              self.value_col, self.id_col, self.duration)
        (parts.write.mode("overwrite")
         .parquet(f"{self.out}/epoch_id={int(epoch_id)}"))

    def read(self, spark):
        """Merged candles in the batch query's exact schema."""
        parts = spark.read.parquet(self.out)
        return (ohlc_merge(parts, self.keys)
                .select(*self.keys, "open_e2", "high_e2", "low_e2",
                        "close_e2", "volume", "window_start_us"))


class DrawdownSink:
    """Streaming maximum drawdown — the live face of the batch
    ``max_drawdown`` query (B52).  Drawdown is NOT a plain monoid
    (the running peak crosses epoch boundaries), but under the
    TransitionSink ordering contract (epochs don't interleave a
    user's time order) the per-epoch partials

        (n, peak_e2, min_e2, mdd_e2)

    merge EXACTLY: for ordered epochs A then B,
    ``mdd(AB) = max(mdd_A, mdd_B, peak_A − min_B)`` — the only
    cross-boundary drawdowns are a prior peak against a later
    minimum, and maxima/minima are order-free.  ``read()`` realizes
    this with one prefix-peak window over each user's epoch-ordered
    partials + one agg (same single-exchange discipline as the batch
    query; state is one row per (user, epoch), never the raw
    series).  Epoch overwrite is retry-idempotent."""

    def __init__(self, out_path: str, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 id_col: str = "event_id"):
        self.out = out_path.rstrip("/")
        self.user_col, self.ts_col = user_col, ts_col
        self.value_col, self.id_col = value_col, id_col

    def __call__(self, batch_df, epoch_id: int) -> None:
        from pyspark.sql.window import Window as Wnd

        v_e2 = F.round(F.col(self.value_col) * 100).cast("long")
        w = (Wnd.partitionBy(self.user_col)
             .orderBy(self.ts_col, self.id_col)
             .rowsBetween(Wnd.unboundedPreceding, Wnd.currentRow))
        stepped = batch_df.select(
            F.col(self.user_col).alias("user"), v_e2.alias("_v"),
            (F.max(v_e2).over(w) - v_e2).alias("_dd"))
        part = (stepped.groupBy("user")
                .agg(F.count("*").alias("n"),
                     F.max("_v").alias("peak_e2"),
                     F.min("_v").alias("min_e2"),
                     F.max("_dd").alias("mdd_e2")))
        (part.write.mode("overwrite")
         .parquet(f"{self.out}/epoch_id={int(epoch_id)}"))

    def read(self, spark):
        """Merged per-user drawdown in the batch query's schema."""
        from pyspark.sql.window import Window as Wnd

        parts = spark.read.parquet(self.out)
        # prior-epoch running peak (strictly before this epoch); the
        # cross-boundary drawdown is that peak against this epoch's min
        wp = (Wnd.partitionBy("user").orderBy("epoch_id")
              .rowsBetween(Wnd.unboundedPreceding, -1))
        staged = parts.withColumn("_prev_peak",
                                  F.max("peak_e2").over(wp))
        cross = F.when(F.col("_prev_peak").isNotNull(),
                       F.col("_prev_peak") - F.col("min_e2"))
        return (staged
                .withColumn("_mdd", F.greatest(
                    F.col("mdd_e2"), F.coalesce(cross, F.lit(0))))
                .groupBy("user")
                .agg(F.sum("n").alias("n_events"),
                     F.max("peak_e2").alias("peak_e2"),
                     F.max("_mdd").alias("max_drawdown_e2"))
                .select(F.col("user").cast("string").alias("key"),
                        F.col("n_events").cast("long"),
                        F.col("peak_e2").cast("long"),
                        F.col("max_drawdown_e2").cast("long")))


class SessionizeSink:
    """Streaming gap-sessionization with CROSS-EPOCH stitching — the
    stateful sink the 30-min-gap islands need when a session spans a
    micro-batch boundary: an open-session state table (user,
    session_start, last_event, count) carries between epochs; each
    epoch seeds its island computation with a pseudo-event at the
    stored last_event so the first in-gap island CONTINUES the stored
    session (start and counts inherited), an out-of-gap first island
    CLOSES it, and each user's final island stays open for the next
    epoch.  ``read()`` returns closed sessions from every epoch plus
    the latest open table — exactly the batch islands of everything
    seen (tested, including boundary-spanning sessions).

    Layout (ExactlyOnceBatchSink discipline, whole-epoch overwrite,
    retry-idempotent):

      out/closed/epoch_id=N  sessions closed BY epoch N
      out/open/epoch_id=N    the FULL open-session table as of N

    Ordering contract: epochs must not interleave a user's
    (ts, event_id) order (the TransitionSink contract)."""

    GAP_US = 30 * 60 * 1_000_000

    def __init__(self, out_path: str, user_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 gap_us: int = None):
        self.out = out_path.rstrip("/")
        self.user_col, self.ts_col, self.id_col = user_col, ts_col, id_col
        self.gap_us = gap_us or self.GAP_US

    def _latest(self, spark, sub: str, before_epoch: int):
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        base = jvm.org.apache.hadoop.fs.Path(f"{self.out}/{sub}")
        fs = base.getFileSystem(hconf)
        cand = []
        if fs.exists(base):
            for st in fs.listStatus(base):
                name = st.getPath().getName()
                if name.startswith("epoch_id="):
                    e = int(name.split("=")[1])
                    if e < before_epoch:
                        cand.append(e)
        if not cand:
            return None
        return spark.read.parquet(
            f"{self.out}/{sub}/epoch_id={max(cand)}")

    def __call__(self, batch_df, epoch_id: int) -> None:
        from pyspark.sql.window import Window as Wnd

        spark = batch_df.sparkSession
        epoch_id = int(epoch_id)
        ev = batch_df.select(
            F.col(self.user_col).alias("user"),
            F.unix_micros(F.col(self.ts_col)).alias("t"),
            F.col(self.id_col).cast("long").alias("eid"),
            F.lit(None).cast("long").alias("p_start"),
            F.lit(None).cast("long").alias("p_n"))
        prev = self._latest(spark, "open", epoch_id)
        if prev is not None:
            pseudo = prev.select(
                "user", F.col("last_us").alias("t"),
                F.lit(-1).cast("long").alias("eid"),
                F.col("start_us").alias("p_start"),
                F.col("n").alias("p_n"))
            ev = pseudo.unionByName(ev)
        w = Wnd.partitionBy("user").orderBy("t", "eid")
        gap = F.col("t") - F.lag("t").over(w)
        new_s = F.when(gap.isNull() | (gap > self.gap_us), 1).otherwise(0)
        run = w.rowsBetween(Wnd.unboundedPreceding, 0)
        isl = (ev.withColumn("_sid", F.sum(new_s).over(run))
               .groupBy("user", "_sid")
               .agg(F.max("p_start").alias("p_start"),
                    F.max("p_n").alias("p_n"),
                    F.min(F.when(F.col("eid") >= 0, F.col("t")))
                    .alias("real_min"),
                    F.max("t").alias("end_us"),
                    F.sum(F.when(F.col("eid") >= 0, 1).otherwise(0))
                    .alias("n_real"))
               .select(
                   "user", "_sid",
                   F.coalesce("p_start", "real_min").alias("start_us"),
                   F.col("end_us").alias("last_us"),
                   (F.coalesce(F.col("p_n"), F.lit(0))
                    + F.col("n_real")).alias("n")))
        mx = isl.groupBy("user").agg(F.max("_sid").alias("_mx"))
        j = isl.join(mx, "user")
        closed = (j.filter(F.col("_sid") < F.col("_mx"))
                  .select("user", "start_us",
                          F.col("last_us").alias("end_us"), "n"))
        open_t = (j.filter(F.col("_sid") == F.col("_mx"))
                  .select("user", "start_us", "last_us", "n"))
        (closed.write.mode("overwrite")
         .parquet(f"{self.out}/closed/epoch_id={epoch_id}"))
        (open_t.write.mode("overwrite")
         .parquet(f"{self.out}/open/epoch_id={epoch_id}"))
        self._last_epoch = epoch_id

    def read(self, spark):
        """All sessions of everything seen: closed epochs + the
        latest open table (still-open sessions included)."""
        open_t = self._latest(spark, "open", 1 << 62)
        jvm = spark._jvm
        cpath = jvm.org.apache.hadoop.fs.Path(f"{self.out}/closed")
        fs = cpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = None
        if fs.exists(cpath):
            out = (spark.read.parquet(f"{self.out}/closed")
                   .select("user", "start_us", "end_us", "n"))
        if open_t is not None:
            op = open_t.select("user", "start_us",
                               F.col("last_us").alias("end_us"), "n")
            out = op if out is None else out.unionByName(op)
        if out is None:
            # nothing written yet — empty frame, not AttributeError
            # downstream (r9 ADVICE)
            return spark.createDataFrame(
                [], "user string, start_us long, end_us long, n long")
        return out


def seasonal_cells(ev, type_col: str = "event_type",
                   ts_col: str = "ts"):
    """(type, date, hour-of-day, weekday) → count — the cell table
    B74 and SeasonalBaselineSink score.  ADDITIVE: summing per-epoch
    cell tables equals the whole-stream cell table, which is what
    makes the streaming face exact.  Weekday is the engine-neutral
    (epoch_days + 3) % 7 (0 = Monday)."""
    return (ev.groupBy(F.col(type_col).alias("event_type"),
                       F.to_date(ts_col).alias("_d"),
                       F.hour(ts_col).alias("hod"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .withColumn("dow", F.expr(
                "(datediff(_d, DATE '1970-01-01') + 3) % 7")))


def seasonal_score(cell):
    """Median/MAD scoring of a seasonal cell table: each (type,
    date, hour) against its OWN (type, weekday, hour-of-day) bucket
    across weeks — B62's exact-integer robust discipline (lower
    median k = (n+1) DIV 2, spike ⟺ (c−med)·1e4 > 44478·mad ∧
    c > med).  Two windows over the small cell frame + broadcast
    stats back."""
    from pyspark.sql.window import Window

    key = ["event_type", "dow", "hod"]
    wk = Window.partitionBy(*key).orderBy("cnt", "_d")
    med = (cell.withColumn("_rn", F.row_number().over(wk))
           .withColumn("_n", F.count("*").over(Window.partitionBy(*key)))
           .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
           .select(*key, F.col("cnt").alias("med")))
    dev = (cell.join(F.broadcast(med), key)
           .withColumn("_dev", F.abs(F.col("cnt") - F.col("med"))))
    wd = Window.partitionBy(*key).orderBy("_dev", "_d")
    mad = (dev.withColumn("_rn", F.row_number().over(wd))
           .withColumn("_n", F.count("*").over(Window.partitionBy(*key)))
           .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
           .select(*key, F.col("_dev").alias("mad")))
    j = dev.join(F.broadcast(mad), key)
    spike = ((F.col("cnt") > F.col("med"))
             & ((F.col("cnt") - F.col("med")) * 10000
                > 44478 * F.col("mad")))
    return j.select("event_type",
                    F.date_format("_d", "yyyy-MM-dd").alias("day"),
                    F.col("hod").cast("long"),
                    F.col("dow").cast("long"),
                    "cnt", "med", "mad", spike.alias("is_spike"))


class SeasonalBaselineSink:
    """Streaming face of B74 — the per-epoch cell tables are
    ADDITIVE (counts per (type, date, hour)), so merging epoch
    partials and scoring the merged frame reproduces the batch
    seasonal_anomalies table EXACTLY; no carried classification
    state at all, just the tiny cell partials.

    Layout (whole-epoch overwrite, retry-idempotent):

      out/cells/epoch_id=N  the epoch's cell counts

    read() sums every epoch's partials and runs the same
    seasonal_score kernel the batch query uses — stream ≡ batch by
    shared code, not by parallel implementations."""

    def __init__(self, out_path: str, type_col: str = "event_type",
                 ts_col: str = "ts"):
        self.out = out_path.rstrip("/")
        self.type_col, self.ts_col = type_col, ts_col

    def __call__(self, batch_df, epoch_id: int) -> None:
        cells = seasonal_cells(batch_df, self.type_col, self.ts_col)
        (cells.write.mode("overwrite")
         .parquet(f"{self.out}/cells/epoch_id={int(epoch_id)}"))

    def read(self, spark):
        merged = (spark.read.parquet(f"{self.out}/cells")
                  .groupBy("event_type", "_d", "hod", "dow")
                  .agg(F.sum("cnt").cast("long").alias("cnt")))
        return seasonal_score(merged)


class GrowthAccountingSink:
    """Streaming GROWTH ACCOUNTING — the cross-epoch face of the
    B73 batch query: per week, actives split into new / retained /
    resurrected plus churned, accumulated across micro-batches with
    a tiny per-user state table (first_wk, last_wk — two longs, not
    the week set).  Each epoch seeds every known user with a pseudo
    row at its stored last week, so a lag window classifies the
    epoch's (user, week) rows exactly as the batch lag does: gap 0 =
    already counted, gap 1 = retained, gap >1 = resurrected (and the
    user churned at prev+1).  Brand-new users classify as new on
    their first row.  Trailing churn (a user's LAST week before the
    corpus max) is right-censored exactly like the batch query: it
    is derived at ``read()`` time from the state table, never
    emitted early — so a user who later returns was never
    double-counted.

    Layout (ExactlyOnceBatchSink discipline, whole-epoch overwrite,
    retry-idempotent):

      out/weekly/epoch_id=N  per-week state deltas from epoch N
      out/state/epoch_id=N   the FULL (user, first_wk, last_wk) table

    Ordering contract: a user's weeks must not interleave across
    epochs (the TransitionSink/SessionizeSink contract); re-seeing
    the stored last week is fine and counts nothing twice."""

    def __init__(self, out_path: str, user_col: str = "user_id",
                 ts_col: str = "ts"):
        self.out = out_path.rstrip("/")
        self.user_col, self.ts_col = user_col, ts_col

    _latest = SessionizeSink._latest

    def __call__(self, batch_df, epoch_id: int) -> None:
        from pyspark.sql.window import Window as Wnd

        spark = batch_df.sparkSession
        epoch_id = int(epoch_id)
        uw = (batch_df.select(
            F.col(self.user_col).alias("user"),
            F.expr(f"datediff(to_date({self.ts_col}), "
                   "DATE '1970-01-01') div 7").alias("wk"))
            .distinct()
            .withColumn("_seed", F.lit(0)))
        prev = self._latest(spark, "state", epoch_id)
        if prev is not None:
            uw = uw.unionByName(prev.select(
                "user", F.col("last_wk").alias("wk"),
                F.lit(1).alias("_seed")))
        # seed sorts before an equal-week real row → that row sees
        # gap 0 and counts nothing (the re-seen-week contract)
        w = Wnd.partitionBy("user").orderBy("wk", F.desc("_seed"))
        rows = (uw.withColumn("_prev", F.lag("wk").over(w))
                .filter(F.col("_seed") == 0))
        gap = F.col("wk") - F.col("_prev")
        cls = (rows
               .withColumn("_new", F.col("_prev").isNull()
                           .cast("long"))
               .withColumn("_ret", (gap == 1).cast("long"))
               .withColumn("_res", (gap > 1).cast("long")))
        weekly = (cls.filter((F.col("_new") == 1) | (F.col("_ret") == 1)
                             | (F.col("_res") == 1))
                  .groupBy("wk")
                  .agg(F.sum("_new").alias("n_new"),
                       F.sum("_ret").alias("n_retained"),
                       F.sum("_res").alias("n_resurrected"),
                       F.lit(0).cast("long").alias("n_churned")))
        churn = (cls.filter(gap > 1)
                 .groupBy((F.col("_prev") + 1).alias("wk"))
                 .agg(F.count("*").cast("long").alias("n_churned"),
                      F.lit(0).cast("long").alias("n_new"),
                      F.lit(0).cast("long").alias("n_retained"),
                      F.lit(0).cast("long").alias("n_resurrected")))
        deltas = (weekly.unionByName(churn)
                  .groupBy("wk")
                  .agg(F.sum("n_new").alias("n_new"),
                       F.sum("n_retained").alias("n_retained"),
                       F.sum("n_resurrected").alias("n_resurrected"),
                       F.sum("n_churned").alias("n_churned")))
        batch_state = (uw.groupBy("user")
                       .agg(F.min(F.when(F.col("_seed") == 0,
                                         F.col("wk"))).alias("_bfirst"),
                            F.max("wk").alias("last_wk")))
        if prev is not None:
            state = (batch_state.join(
                prev.select("user", F.col("first_wk").alias("_pfirst")),
                "user", "full")
                .select("user",
                        F.least(F.coalesce("_pfirst", F.lit(1 << 60)),
                                F.coalesce("_bfirst", F.lit(1 << 60)))
                        .alias("first_wk"),
                        F.col("last_wk")))
        else:
            state = batch_state.select(
                "user", F.col("_bfirst").alias("first_wk"), "last_wk")
        (deltas.write.mode("overwrite")
         .parquet(f"{self.out}/weekly/epoch_id={epoch_id}"))
        (state.write.mode("overwrite")
         .parquet(f"{self.out}/state/epoch_id={epoch_id}"))
        self._last_epoch = epoch_id

    def read(self, spark):
        """The B73 table over everything seen: summed epoch deltas
        plus the read-time right-censored trailing churn."""
        state = self._latest(spark, "state", 1 << 62)
        if state is None:
            # nothing written yet — empty frame, not AttributeError
            # downstream (r9 ADVICE)
            return spark.createDataFrame(
                [], "week long, n_new long, n_retained long, "
                    "n_resurrected long, n_churned long, n_active long")
        deltas = (spark.read.parquet(f"{self.out}/weekly")
                  .groupBy("wk")
                  .agg(F.sum("n_new").alias("n_new"),
                       F.sum("n_retained").alias("n_retained"),
                       F.sum("n_resurrected").alias("n_resurrected"),
                       F.sum("n_churned").alias("n_churned")))
        mx = state.agg(F.max("last_wk").alias("_mx"))
        trailing = (state.crossJoin(F.broadcast(mx))
                    .filter(F.col("last_wk") < F.col("_mx"))
                    .groupBy((F.col("last_wk") + 1).alias("wk"))
                    .agg(F.count("*").cast("long").alias("_tc")))
        return (deltas.join(trailing, "wk", "full")
                .select(F.col("wk").cast("long").alias("week"),
                        F.coalesce("n_new", F.lit(0)).cast("long")
                        .alias("n_new"),
                        F.coalesce("n_retained", F.lit(0)).cast("long")
                        .alias("n_retained"),
                        F.coalesce("n_resurrected", F.lit(0))
                        .cast("long").alias("n_resurrected"),
                        (F.coalesce("n_churned", F.lit(0))
                         + F.coalesce("_tc", F.lit(0))).cast("long")
                        .alias("n_churned"))
                .withColumn("n_active",
                            (F.col("n_new") + F.col("n_retained")
                             + F.col("n_resurrected")).cast("long")))


def event_transition_counts(df, user_col: str, ts_col: str,
                            type_col: str, id_col: str = None):
    """(from, to) successor counts over per-user ``ts``-ordered
    sequences — the batch kernel `queries.analytics.event_transitions`
    and the streaming `TransitionSink` share.  One user-keyed lead
    window + a types-sized hash-agg.  ``id_col`` (an event id) breaks
    same-user ts ties into the SAME total (ts, id) order the batch
    query uses — without it tied timestamps could order differently
    between the batch and streaming faces (ADVICE r7); when the
    source has no id column the fallback tiebreak is the type."""
    from pyspark.sql.window import Window

    tie = F.col(id_col) if id_col else F.col(type_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), tie)
    return (df.select(F.col(user_col),
                      F.col(type_col).alias("event_type"),
                      F.lead(type_col).over(w).alias("next_event_type"))
            .filter(F.col("next_event_type").isNotNull())
            .groupBy("event_type", "next_event_type")
            .agg(F.count("*").alias("cnt")))


class TransitionSink:
    """Streaming Markov transition matrix — the live face of the
    batch `event_transitions` query, with the one piece a
    stateless-per-epoch sink cannot fake: the LAST event of each user
    in epoch N must pair with their FIRST event in epoch N+1, so the
    sink carries a users-sized last-event state table between epochs.

    Layout (ExactlyOnceBatchSink discipline — every write is a whole
    epoch directory, retry-idempotent):

      out/pairs/epoch_id=N   (event_type, next_event_type, cnt)
                             partials — associative, merge by SUM
      out/last/epoch_id=N    (user, ts, event_type) — the FULL
                             updated last-event table as of epoch N

    ``read()`` merges the pair partials and returns exactly the
    batch query's schema (counts + integer micro-unit conditional
    probability), so dashboards swap live/batch without changes.

    Ordering contract: epochs must not interleave a user's
    (ts, event_id) order (true for ts-ordered sources and for
    watermarked streams read in order; same-ts ties are fine as long
    as ids are assigned in arrival order); within an epoch any order
    is fine — the window sorts under the SAME (ts, event_id) total
    order the batch query uses, so stream ≡ batch holds on tied
    timestamps too (ADVICE r7).  Scale: per epoch one users-sized state merge
    + the same lead window the batch kernel runs."""

    def __init__(self, out_path: str, user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 id_col: str = "event_id"):
        self.out = out_path.rstrip("/")
        self.user_col, self.ts_col = user_col, ts_col
        self.type_col, self.id_col = type_col, id_col

    def _last_state(self, spark, before_epoch: int):
        # list epoch dirs through the Hadoop FS API (the changelog.py
        # discipline — os.listdir is wrong on hdfs:// / s3a:// where
        # isdir is always False and prev state would silently read as
        # None, dropping cross-epoch boundary pairs; ADVICE r7)
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        base = jvm.org.apache.hadoop.fs.Path(f"{self.out}/last")
        fs = base.getFileSystem(hconf)
        cand = []
        if fs.exists(base):
            for st in fs.listStatus(base):
                name = st.getPath().getName()
                if name.startswith("epoch_id="):
                    e = int(name.split("=")[1])
                    if e < before_epoch:
                        cand.append(e)
        if not cand:
            return None
        return spark.read.parquet(
            f"{self.out}/last/epoch_id={max(cand)}")

    def __call__(self, batch_df, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch_id = int(epoch_id)
        ev = batch_df.select(F.col(self.user_col).alias("user"),
                             F.col(self.ts_col).alias("ts"),
                             F.col(self.id_col).alias("event_id"),
                             F.col(self.type_col).alias("event_type"))
        prev = self._last_state(spark, epoch_id)
        # a prev-state row is ONE event per user, so unioning it adds
        # exactly the boundary pair (state → first batch event) and
        # nothing already counted in prior epochs
        seq = ev if prev is None else prev.unionByName(ev)
        pairs = event_transition_counts(seq, "user", "ts",
                                        "event_type", id_col="event_id")
        (pairs.write.mode("overwrite")
         .parquet(f"{self.out}/pairs/epoch_id={epoch_id}"))
        last = (seq.groupBy("user")
                .agg(F.max(F.struct("ts", "event_id", "event_type"))
                     .alias("_m"))
                .select("user", F.col("_m.ts").alias("ts"),
                        F.col("_m.event_id").alias("event_id"),
                        F.col("_m.event_type").alias("event_type")))
        (last.write.mode("overwrite")
         .parquet(f"{self.out}/last/epoch_id={epoch_id}"))

    def read(self, spark):
        parts = spark.read.parquet(f"{self.out}/pairs")
        cnt = (parts.groupBy("event_type", "next_event_type")
               .agg(F.sum("cnt").alias("cnt")))
        tot = cnt.groupBy("event_type").agg(F.sum("cnt").alias("_tot"))
        return (cnt.join(tot, "event_type")
                .select("event_type", "next_event_type",
                        F.col("cnt").cast("long"),
                        F.expr("cnt * 1000000L DIV _tot").cast("long")
                        .alias("prob_e6")))
