"""External KV sink (examples/7-redis port): store contract, per-
partition builder writes, tombstones, replay idempotence, and the
live foreachBatch path."""

import datetime as dt

from pyspark.sql import functions as F

from goka_spark.operators.kv_sink import DirKVStore, kv_upsert_sink
from goka_spark.streaming.runtime import stream_from_dir

SCHEMA = "key string, ts timestamp, value double"


def test_dir_kv_store_contract(tmp_path):
    s = DirKVStore(str(tmp_path), "ns1")
    assert s.get("a") is None
    s.set("a", b"1")
    s.set("b/with:odd chars", b"2")
    assert s.get("a") == b"1"
    assert s.keys() == ["a", "b/with:odd chars"]
    s.delete("a")
    s.delete("missing")  # no-op
    assert s.get("a") is None and s.keys() == ["b/with:odd chars"]
    # namespaces isolate (goka storage/redis namespace prefix)
    assert DirKVStore(str(tmp_path), "ns2").keys() == []


def test_kv_sink_upsert_and_tombstone(spark, tmp_path):
    root = str(tmp_path)
    sink = kv_upsert_sink(lambda: DirKVStore(root, "t"))
    df = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "key string, value string")
    sink(df, 0)
    store = DirKVStore(root, "t")
    assert store.keys() == ["a", "b", "c"]
    assert store.get("b") == b"2"
    # upsert overwrites; NULL deletes (ctx.Delete tombstone)
    sink(spark.createDataFrame([("b", "20"), ("c", None)],
                               "key string, value string"), 1)
    assert store.get("b") == b"20" and store.get("c") is None
    # replaying an epoch converges to the same state (exactly-once
    # under foreachBatch at-least-once replay)
    sink(spark.createDataFrame([("b", "20"), ("c", None)],
                               "key string, value string"), 1)
    assert store.keys() == ["a", "b"]


def test_kv_sink_binary_values(spark, tmp_path):
    root = str(tmp_path)
    sink = kv_upsert_sink(lambda: DirKVStore(root, "bin"))
    df = spark.createDataFrame([("k", bytearray(b"\x00\xff"))],
                               "key string, value binary")
    sink(df, 0)
    assert DirKVStore(root, "bin").get("k") == b"\x00\xff"


def test_kv_sink_foreach_batch_live(spark, tmp_path):
    """Streaming export: group-table updates flow into the external
    store per micro-batch through the per-partition builder."""
    src = str(tmp_path / "topic")
    root = str(tmp_path / "kv")
    rows = [("u1", dt.datetime(2024, 1, 1, 0, i), float(i)) for i in range(3)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = kv_upsert_sink(lambda: DirKVStore(root, "live"))

    def export(batch_df, epoch_id):
        table = (batch_df.groupBy("key")
                 .agg(F.count("*").cast("string").alias("value")))
        sink(table, epoch_id)

    q = (stream_from_dir(spark, src, SCHEMA)
         .writeStream.outputMode("append")
         .foreachBatch(export)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        store = DirKVStore(root, "live")
        assert store.get("u1") == b"3"
        spark.createDataFrame(
            [("u2", dt.datetime(2024, 1, 1, 1, 0), 9.0)], SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert store.get("u2") == b"1"
    finally:
        q.stop()
