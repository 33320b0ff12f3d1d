"""Kafka wire-schema contract (A22 derisk): goka's transport is Kafka
(producer.go Emit, topic_manager.go); no broker runs in this
container, so the contract is pinned structurally — encode to the
EXACT column layout Spark's kafka connector produces
(includeHeaders=true), decode back, and run the processor over the
decoded stream.  On a real cluster the same ``from_kafka_records``
applies unchanged to ``spark.readStream.format("kafka")`` output.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from goka_spark import AggFold, Int64Codec, define_group, input_stream, persist
from goka_spark.operators.processor import Processor
from goka_spark.sources import (
    KAFKA_WIRE_SCHEMA,
    from_kafka_records,
    to_kafka_records,
)

SCHEMA = "key string, ts timestamp, value double, tag string"


def _topic(spark):
    rows = [
        ("u1", dt.datetime(2024, 1, 1, 0, i), float(i), f"t{i % 2}")
        for i in range(4)
    ] + [("u2", dt.datetime(2024, 1, 1, 1, 0), 9.0, "t0")]
    return spark.createDataFrame(rows, SCHEMA)


def test_wire_schema_matches_connector_contract(spark):
    """The encoded frame is column-for-column what the kafka source
    yields — a reader written against it works on a real cluster."""
    wire = to_kafka_records(_topic(spark), "events")
    expect = spark.createDataFrame([], KAFKA_WIRE_SCHEMA)
    # names + types pinned; nullability is writer-specific
    assert [(f.name, f.dataType) for f in wire.schema.fields] == \
        [(f.name, f.dataType) for f in expect.schema.fields]


def test_json_value_roundtrip_with_headers(spark):
    df = _topic(spark).withColumn(
        "headers", F.create_map(
            F.lit("trace"), F.encode(F.concat(F.lit("t-"), "tag"), "UTF-8")))
    wire = to_kafka_records(df, "events", headers_col="headers")
    back = from_kafka_records(wire, value_schema="value double, tag string")
    assert set(back.columns) == {"key", "value", "tag", "ts", "headers"}
    got = {(r.key, r.ts, r.value, r.tag, bytes(r.headers["trace"]))
           for r in back.collect()}
    want = {(r.key, r.ts, r.value, r.tag, f"t-{r.tag}".encode())
            for r in df.collect()}
    assert got == want


def test_codec_value_roundtrip(spark):
    """Single-column value through a goka codec (codec.go Encode/
    Decode), binary on the wire."""
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 7), ("b", dt.datetime(2024, 1, 2), -42)],
        "key string, ts timestamp, n long")
    wire = to_kafka_records(df, "nums", codec=Int64Codec(), value_col="n")
    assert dict(wire.dtypes)["value"] == "binary"
    back = from_kafka_records(wire, codec=Int64Codec(), value_col="n")
    assert {(r.key, r.n) for r in back.collect()} == {("a", 7), ("b", -42)}


def test_partition_and_offset_discipline(spark):
    """Same key -> same partition (copartitioning survives the wire);
    offsets are dense per partition, ordered by record time."""
    wire = to_kafka_records(_topic(spark), "events", num_partitions=8)
    rows = wire.select("key", "partition", "offset", "timestamp").collect()
    parts = {}
    for r in rows:
        parts.setdefault(bytes(r.key), set()).add(r.partition)
    assert all(len(p) == 1 for p in parts.values())
    by_part = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append(r)
    for recs in by_part.values():
        recs.sort(key=lambda r: r.offset)
        assert [r.offset for r in recs] == list(range(len(recs)))
        ts = [r.timestamp for r in recs]
        assert ts == sorted(ts)


def test_processor_over_decoded_wire_equals_direct(spark):
    """The full consume path: wire-decoded topic through the processor
    gives the same table as processing the original dataset directly."""
    df = _topic(spark)
    wire = to_kafka_records(df, "events")
    decoded = from_kafka_records(
        wire, value_schema="value double, tag string")
    g = define_group(
        "kc", input_stream("t"),
        persist(AggFold({"cnt": F.count("*"), "sum_v": F.sum("value")})))
    direct = {(r.key, r.cnt, r.sum_v)
              for r in Processor(g).run({"t": df}).table.collect()}
    via_wire = {(r.key, r.cnt, r.sum_v)
                for r in Processor(g).run({"t": decoded}).table.collect()}
    assert via_wire == direct


def test_codec_requires_single_value_column(spark):
    with pytest.raises(ValueError, match="value column"):
        to_kafka_records(_topic(spark), "events", codec=Int64Codec())


def test_keep_meta_exposes_provenance(spark):
    """ctx.Topic()/Partition()/Offset() parity (context.go:282-294):
    folds can see record provenance when asked."""
    wire = to_kafka_records(_topic(spark), "events")
    back = from_kafka_records(
        wire, value_schema="value double, tag string", keep_meta=True)
    assert {"topic", "partition", "offset"} <= set(back.columns)
    assert back.select("topic").distinct().collect()[0].topic == "events"
