"""Mirror of goka examples/1-simplest: emit events, count per key.

Run: python examples/simplest.py
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import (AggFold, Emitter, Processor, StringCodec, View,
                        define_group, get_session, input_stream, persist)

spark = get_session("example-simplest")

import tempfile

topic_path = tempfile.mkdtemp() + "/example-stream"

# --- emitter side (1-simplest runEmitter) ---
emitter = Emitter(spark, topic_path, codec=StringCodec())
emitter.emit_sync("some-key", "some-value")
emitter.emit_sync("some-key", "another-value")
emitter.emit_sync("other-key", "hello")

# --- processor side (1-simplest runProcessor: count per key) ---
stream = emitter.read().withColumn("ts", F.current_timestamp())
g = define_group(
    "example-group",
    input_stream("example-stream"),
    persist(AggFold({"counter": F.count("*")})),
)
table = Processor(g).run({"example-stream": stream}).table

view = View(table)
assert view.get("some-key") == {"counter": 2}
assert view.get("other-key") == {"counter": 1}
print("group table:", sorted(view.iterator()))
print("OK")
