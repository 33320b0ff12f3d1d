"""Topic sources/sinks — datasets standing in for Kafka topics.

goka's only transport is Kafka (topic_manager.go, producer.go,
broker.go).  A Spark engine reads topics from whatever the lake
speaks; each reader returns the standard topic shape (payload columns
+ optional key/ts) ready for ``Processor.run``:

- parquet / json / csv batch datasets,
- streaming file sources (``streaming.runtime.stream_from_dir``),
- a real Kafka source/sink config builder (usable on clusters with
  the kafka connector on the classpath; not exercisable in this
  container, so it only *builds* the reader).

TopicManager parity: ``topic_exists`` / ``ensure_topic`` manage the
dataset location the way goka's TopicManager manages topics.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_topic(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: Optional[str] = None, **options) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", schema is None)
    return reader.format(fmt).options(**options).load(path)


def write_topic(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "append", partition_by: Optional[list[str]] = None,
                **options) -> None:
    w = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def kafka_source(spark: SparkSession, brokers: list[str], topic: str,
                 starting_offsets: str = "earliest"):
    """Streaming Kafka reader (goka's consumer — requires the
    spark-sql-kafka connector at runtime; config-only here).

    Key/value arrive as binary — decode with a goka_spark Codec's
    ``decode_col`` (goka: Codec.Decode at consume time)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(brokers))
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )


def kafka_sink(df: DataFrame, brokers: list[str], topic: str,
               checkpoint: str):
    """Streaming Kafka writer (goka's producer — config-only here)."""
    out = df.select(
        F.col("key").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns if c != "key"]))
         .cast("binary").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(brokers))
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def topic_exists(path: str) -> bool:
    """TopicManager.EnsureStreamExists analog for dataset topics."""
    return os.path.exists(path)


def ensure_topic(spark: SparkSession, path: str, schema: str) -> None:
    """Create an empty dataset topic with the given schema if absent."""
    if not topic_exists(path):
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)
