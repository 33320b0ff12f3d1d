"""Streaming runtime tests (A19/A20): live counter graph, custom
stateful fold, exactly-once sink replay."""

import time

import pandas as pd
from pyspark.sql import functions as F

from goka_spark import AggFold, define_group, input_stream, persist
from goka_spark.streaming.runtime import (
    ExactlyOnceBatchSink,
    StreamingProcessor,
    stream_from_dir,
)
from goka_spark.streaming.stateful import stateful_fold

SCHEMA = "key string, ts timestamp, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _rows(n0, n1, key):
    import datetime as dt

    return [(key, dt.datetime(2024, 1, 1, 0, i), float(i)) for i in range(n0, n1)]


def test_streaming_counter_graph(spark, tmp_path):
    """A19: the 1-simplest counter as a live stream — two micro-batches
    arrive, the group table converges to the batch answer."""
    src = str(tmp_path / "topic")
    _write_batch(spark, src, _rows(0, 3, "a") + _rows(0, 2, "b"))

    g = define_group("live", input_stream("t"),
                     persist(AggFold({"cnt": F.count("*")})))
    sp = StreamingProcessor(g)
    q = sp.start_table(
        {"t": stream_from_dir(spark, src, SCHEMA)},
        queryName="live_counts",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, _rows(3, 5, "a"))
        q.processAllAvailable()
        got = {r.key: r.cnt for r in spark.sql("select * from live_counts").collect()}
        assert got == {"a": 5, "b": 2}
    finally:
        q.stop()


def test_stateful_fold_stream(spark, tmp_path):
    """PyFold-style imperative state across micro-batches."""
    src = str(tmp_path / "topic")
    _write_batch(spark, src, _rows(0, 3, "a"))

    def cb(state, row):
        return (state or 0.0) + row["value"]

    stream = stream_from_dir(spark, src, SCHEMA)
    folded = stateful_fold(stream, "key", cb, "total double",
                           order_by=["ts"])
    q = (folded.writeStream.queryName("fold_out").outputMode("update")
         .format("memory")
         .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
    try:
        q.processAllAvailable()
        _write_batch(spark, src, _rows(3, 5, "a"))
        q.processAllAvailable()
        rows = spark.sql("select * from fold_out").collect()
        # update mode: last emitted row for 'a' has the full running sum
        assert max(r.total for r in rows if r.key == "a") == sum(range(5))
    finally:
        q.stop()


def test_exactly_once_sink_replay(spark, tmp_path):
    """A20 DeferCommit: replaying an epoch must not duplicate writes."""
    sink = ExactlyOnceBatchSink(str(tmp_path / "out"))
    df = spark.createDataFrame([("k", 1.0)], "key string, v double")
    sink(df, epoch_id=0)
    sink(df, epoch_id=0)  # replay after simulated crash
    sink(df, epoch_id=1)
    got = spark.read.parquet(str(tmp_path / "out" / "data")).count()
    assert got == 2  # epochs 0 and 1, replay skipped


def test_streaming_output_edge(spark, tmp_path):
    """ctx.Emit on a live stream: output topic gets the filtered feed."""
    from goka_spark import output

    src = str(tmp_path / "topic")
    _write_batch(spark, src, _rows(0, 4, "a"))
    g = define_group(
        "emits", input_stream("t", where=F.col("value") >= 2),
        output("big", transform=lambda df: df.select("key", "value")),
    )
    outs = StreamingProcessor(g).output_streams(
        {"t": stream_from_dir(spark, src, SCHEMA)})
    q = (outs["big"].writeStream.queryName("big_vals").outputMode("append")
         .format("memory")
         .option("checkpointLocation", str(tmp_path / "ckpt3")).start())
    try:
        q.processAllAvailable()
        vals = sorted(r.value for r in spark.sql("select * from big_vals").collect())
        assert vals == [2.0, 3.0]
    finally:
        q.stop()


def test_pyfold_graph_streams_via_state_store(spark, tmp_path):
    """A PyFold graph runs live through applyInPandasWithState with the
    same fold function the batch Processor uses."""
    from goka_spark import PyFold, define_group, input_stream, persist

    src = str(tmp_path / "topic")
    _write_batch(spark, src, _rows(0, 3, "a"))

    def cb(state, row):
        return (state or 0.0) + row["value"]

    g = define_group("pf", input_stream("t"), persist(PyFold(
        func=cb, init=0.0, state_schema="total double",
        finish=lambda s: {"total": round(s, 3)})))
    q = StreamingProcessor(g).start_table(
        {"t": stream_from_dir(spark, src, SCHEMA)},
        queryName="pf_out", checkpoint=str(tmp_path / "ckpt4"))
    try:
        q.processAllAvailable()
        _write_batch(spark, src, _rows(3, 5, "a"))
        q.processAllAvailable()
        rows = spark.sql("select * from pf_out").collect()
        assert max(r.total for r in rows if r.key == "a") == sum(range(5))
    finally:
        q.stop()


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermarked tumbling window: an event arriving far behind the
    watermark is dropped from the (append-mode) window aggregation."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = str(tmp_path / "topic")
    base = dt.datetime(2024, 1, 1)
    # batch 1: events up to 02:30 → watermark advances past 01:00+10m
    _write_batch(spark, src, [("a", base + dt.timedelta(hours=2, minutes=30), 1.0),
                              ("a", base + dt.timedelta(minutes=5), 1.0)])
    stream = stream_from_dir(spark, src, SCHEMA).withWatermark("ts", "10 minutes")
    agg = (stream.groupBy(F.window("ts", "1 hour"))
           .count()
           .select(F.unix_micros("window.start").alias("ws"), "count"))
    q = (agg.writeStream.queryName("wm").outputMode("append").format("memory")
         .option("checkpointLocation", str(tmp_path / "ckpt5")).start())
    try:
        q.processAllAvailable()
        # batch 2: a VERY late event for the 00:00 window (already closed)
        _write_batch(spark, src, [("a", base + dt.timedelta(minutes=6), 1.0)])
        q.processAllAvailable()
        got = {r.ws: r["count"] for r in spark.sql("select * from wm").collect()}
        h0 = int(base.timestamp() * 1e6)
        # the 00:00 window emitted with count=1; the late event never joined it
        assert got.get(h0) == 1
    finally:
        q.stop()
