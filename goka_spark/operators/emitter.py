"""Emitter — append key/value records to a stream dataset.

goka's Emitter (reference: /root/reference/emitter.go:28-124) sends
single key/value messages to a topic, async (Emit → Promise) or sync
(EmitSync).  Spark-first there are two modes:

- ``emit_dataframe(df)`` — the scale path: append a whole DataFrame
  to the topic dataset (parquet append / any sink).
- ``emit(key, value)`` / ``emit_sync`` — goka-API parity for driver
  code & tests: buffered locally, flushed on ``finish()`` (mirrors
  Emitter.Finish waiting for in-flight promises).
"""

from __future__ import annotations

import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goka_spark.codecs import Codec


class EmitterAlreadyClosedError(RuntimeError):
    """errors.go:11 ErrEmitterAlreadyClosed: Emit after Finish."""


class Emitter:
    def __init__(self, spark: SparkSession, topic_path: str,
                 codec: Optional[Codec] = None, value_col: str = "value",
                 default_headers: Optional[dict[str, bytes]] = None):
        self.spark = spark
        self.topic_path = topic_path
        self.codec = codec
        self.value_col = value_col
        # goka WithEmitterDefaultHeaders (options.go:625): merged under
        # per-emit headers (per-emit keys win, headers.go Merged)
        self.default_headers = default_headers
        self._buffer: list[tuple[str, Any, Optional[dict[str, bytes]]]] = []
        self._closed = False

    def emit(self, key: Any, value: Any,
             headers: Optional[dict[str, bytes]] = None) -> None:
        """Buffered single-record emit (Emitter.Emit, emitter.go:93;
        EmitWithHeaders, emitter.go:60 — headers are raw bytes).
        Raises EmitterAlreadyClosedError after ``finish()``
        (emitter.go:79 rejects new emits once finished)."""
        if self._closed:
            raise EmitterAlreadyClosedError("emitter already closed")
        if self.codec is not None:
            # parity with goka: value must round-trip through the codec
            value = self.codec.decode(self.codec.encode(value))
        if self.default_headers:
            headers = {**self.default_headers, **(headers or {})}
        self._buffer.append((str(key), value, headers))

    def emit_sync(self, key: Any, value: Any,
                  headers: Optional[dict[str, bytes]] = None) -> None:
        """Emitter.EmitSync (emitter.go:119): emit + flush
        immediately.  Like the Go EmitSync, does NOT close — only
        ``finish()`` does."""
        self.emit(key, value, headers)
        self.flush()

    def emit_dataframe(self, df: DataFrame, key: Optional[str] = None,
                       mode: str = "append") -> None:
        """Bulk append — the distributed path."""
        if key is not None:
            df = df.withColumn("key", F.col(key).cast("string"))
        df.write.mode(mode).parquet(self.topic_path)

    def finish(self) -> None:
        """Emitter.Finish (emitter.go:124): flush all pending records
        and CLOSE — subsequent emits raise EmitterAlreadyClosedError
        (emitter.go:79)."""
        self.flush()
        self._closed = True

    def flush(self) -> None:
        """Flush buffered records without closing.
        If any record carries headers the topic schema grows a
        ``headers map<string,binary>`` column (headers.go:8)."""
        if not self._buffer:
            return
        vt = self.codec.spark_type.simpleString() if self.codec else "string"
        schema = f"key string, {self.value_col} {vt}"
        if any(h is not None for _, _, h in self._buffer):
            schema += ", headers map<string,binary>"
            rows = self._buffer
        else:
            rows = [(k, v) for k, v, _ in self._buffer]
        df = self.spark.createDataFrame(rows, schema=schema)
        df.write.mode("append").parquet(self.topic_path)
        self._buffer = []

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.topic_path)

    def exists(self) -> bool:
        return os.path.exists(self.topic_path)
