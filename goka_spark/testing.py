"""Tester — in-process test harness, mirroring goka's ``tester`` package.

goka's Tester (reference: /root/reference/tester/tester.go:85-300)
lets unit tests drive a processor without Kafka: push messages into
topics, then assert group-table values and emitted messages.  The
Spark-native analog accumulates messages in local queues, recomputes
the graph's batch plan on demand, and exposes the same assertions:

    t = Tester(spark, graph)
    t.register_topic("clicks", "user string, n long")
    t.consume("clicks", key="alice", value={"user": "alice", "n": 1})
    assert t.table_value("alice")["cnt"] == 1
    msgs = t.messages("output-topic")

Recompute-from-log is exactly goka's recovery semantics (a processor
rebuilds its table by replaying the changelog), so batch-replay
equivalence is the correctness contract being tested.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from goka_spark.graph import GroupGraph
from goka_spark.operators.processor import Processor, ProcessorResult


class Tester:
    def __init__(self, spark: SparkSession, graph: GroupGraph,
                 ts_col: str = "ts"):
        self.spark = spark
        self.graph = graph
        self.ts_col = ts_col
        self._schemas: dict[str, str] = {}
        self._queues: dict[str, list[dict]] = {}
        self._clock = dt.datetime(2024, 1, 1)
        self._result: Optional[ProcessorResult] = None

    def register_topic(self, topic: str, schema: str) -> None:
        """Declare a topic's payload schema (goka: RegisterGroupGraph
        wires codecs per topic — tester.go:190)."""
        self._schemas[topic] = schema
        self._queues.setdefault(topic, [])

    def consume(self, topic: str, key: Any, value: dict,
                ts: Optional[dt.datetime] = None) -> None:
        """Push one message (tester.go Consume): invalidates the last
        run; state is recomputed lazily on next assertion."""
        if topic not in self._schemas:
            raise KeyError(f"register_topic({topic!r}, schema) first")
        self._clock += dt.timedelta(seconds=1)
        row = dict(value)
        row["key"] = str(key)
        row.setdefault(self.ts_col, ts or self._clock)
        self._queues[topic].append(row)
        self._result = None

    def _topic_df(self, topic: str) -> DataFrame:
        schema = f"key string, {self.ts_col} timestamp, {self._schemas[topic]}"
        rows = self._queues[topic]
        fields = [f.strip().split()[0] for f in schema.split(",")]
        data = [tuple(r.get(f) for f in fields) for r in rows]
        return self.spark.createDataFrame(data, schema)

    def run(self) -> ProcessorResult:
        if self._result is None:
            topics = {t: self._topic_df(t) for t in self._schemas}
            self._result = Processor(self.graph).run(topics, ts_col=self.ts_col)
        return self._result

    def table_value(self, key: Any) -> Optional[dict]:
        """Group-table state for a key (tester.go TableValue:282)."""
        return self.run().view().get(str(key))

    def messages(self, topic: str) -> list[dict]:
        """All messages emitted to an output topic (tester's message
        trackers), in deterministic (ts, key) order."""
        out = self.run().outputs.get(topic)
        if out is None:
            raise KeyError(f"graph has no output {topic!r}")
        cols = out.columns
        order = [c for c in (self.ts_col, "key") if c in cols] or cols[:1]
        return [r.asDict(recursive=True) for r in out.orderBy(*order).collect()]
