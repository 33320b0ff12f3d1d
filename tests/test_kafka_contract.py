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


def test_schema_registry_codec_roundtrip(spark):
    """Confluent wire framing (magic 0x00 + u32 schema id + payload)
    over JsonCodec: scalar and column paths produce IDENTICAL bytes
    and round-trip through the kafka wire layout."""
    from goka_spark.codecs import SchemaRegistry

    reg = SchemaRegistry()
    codec = reg.codec_for("events-value", "value double, tag string")
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), (1.5, "t0")),
         ("b", dt.datetime(2024, 1, 2), (-2.0, "t1"))],
        "key string, ts timestamp, v struct<value:double, tag:string>")

    wire = to_kafka_records(df, "events", codec=codec, value_col="v")
    assert dict(wire.dtypes)["value"] == "binary"
    raw = {bytes(r.value) for r in wire.collect()}
    # every wire frame carries the 5-byte registry header, and the
    # SCALAR decoder reads the COLUMN encoder's frames (JSON text may
    # differ between json.dumps and to_json; the framing must not)
    for b in raw:
        assert b[0] == 0x00 and b[1:5] == codec.schema_id.to_bytes(4, "big")
    assert {tuple(sorted(codec.decode(b).items())) for b in raw} == \
        {(("tag", "t0"), ("value", 1.5)), (("tag", "t1"), ("value", -2.0))}

    back = from_kafka_records(wire, codec=codec, value_col="v")
    assert {(r.key, r.v.value, r.v.tag) for r in back.collect()} == \
        {("a", 1.5, "t0"), ("b", -2.0, "t1")}


def test_schema_registry_codec_rejects_foreign_frames(spark):
    """Wrong magic or a different schema id must never decode to
    garbage: scalar raises, column yields NULL."""
    from goka_spark.codecs import SchemaRegistry, SchemaRegistryCodec, JsonCodec

    reg = SchemaRegistry()
    c1 = reg.codec_for("s1-value", "n long")
    c2 = reg.codec_for("s2-value", "n long")
    assert c1.schema_id != c2.schema_id

    frame = c1.encode({"n": 7})
    with pytest.raises(ValueError, match="schema id mismatch"):
        c2.decode(frame)
    with pytest.raises(ValueError, match="bad magic"):
        c1.decode(b"\x01" + frame[1:])
    assert c1.decode(frame) == {"n": 7}

    df = spark.createDataFrame(
        [(frame,), (b"\x01junkjunk",), (c2.encode({"n": 9}),)],
        "value binary")
    got = [r.v for r in df.select(c1.decode_col(F.col("value"))
                                  .alias("v")).collect()]
    assert sorted([g.n if g is not None else None for g in got],
                  key=lambda x: (x is None, x)) == [7, None, None]


def test_schema_registry_idempotent_and_versioned():
    """register() is idempotent per (subject, schema) and assigns a
    NEW id when the subject's schema evolves — latest() tracks it."""
    from goka_spark.codecs import SchemaRegistry

    reg = SchemaRegistry()
    a = reg.register("t-value", "n long")
    assert reg.register("t-value", "n long") == a
    b = reg.register("t-value", "n long, extra string")
    assert b != a and reg.latest("t-value") == b
