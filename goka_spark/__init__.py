"""goka_spark — a PySpark-native engine with the capabilities of lovoo/goka.

Goka (https://github.com/lovoo/goka) composes Kafka stream pipelines
from Emitters, Processors and Views wired by a GroupGraph.  This
package re-expresses that model Spark-first: topics are datasets
(batch parquet or Structured Streaming sources), group tables are
key-partitioned aggregations, joins/lookups are co-partitioned or
broadcast DataFrame joins, and the processor callback is either a
declarative fold (compiled to JVM-side ``groupBy().agg()``) or an
arbitrary Python fold (Arrow-batched ``applyInPandas``).

Public API mirrors goka's surface (reference: /root/reference/graph.go,
processor.go, view.go, emitter.go) without copying its implementation.
"""

from goka_spark.codecs import (BytesCodec, Codec, Int64Codec, JsonCodec,
                               SchemaRegistry, SchemaRegistryCodec,
                               StringCodec)
from goka_spark.graph import (
    GroupGraph,
    define_group,
    group_table,
    input_stream,
    inputs,
    join,
    lookup,
    loop,
    output,
    persist,
    reset_suffixes,
    set_loop_suffix,
    set_table_suffix,
    visitor,
)
from goka_spark.operators.folds import AggFold, PyFold, ReduceFold
from goka_spark.operators.processor import Processor, ProcessorResult
from goka_spark.operators.view import View
from goka_spark.operators.emitter import Emitter
from goka_spark.session import get_session
from goka_spark.web import MonitorServer

__all__ = [
    "AggFold",
    "BytesCodec",
    "Codec",
    "Emitter",
    "GroupGraph",
    "Int64Codec",
    "JsonCodec",
    "SchemaRegistry",
    "SchemaRegistryCodec",
    "MonitorServer",
    "Processor",
    "ProcessorResult",
    "PyFold",
    "ReduceFold",
    "StringCodec",
    "View",
    "define_group",
    "get_session",
    "input_stream",
    "inputs",
    "join",
    "group_table",
    "lookup",
    "loop",
    "output",
    "persist",
    "reset_suffixes",
    "set_loop_suffix",
    "set_table_suffix",
    "visitor",
]
