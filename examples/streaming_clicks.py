"""Mirror of goka examples/2-clicks, live: an emitter feeds a topic
while a streaming processor maintains the click-count table and a
"view" (the in-memory table) serves point queries.

Run: python examples/streaming_clicks.py
"""

import datetime as dt
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import AggFold, define_group, get_session, input_stream, persist
from goka_spark.streaming.runtime import StreamingProcessor, stream_from_dir

spark = get_session("example-streaming-clicks")
tmp = tempfile.mkdtemp()
topic, ckpt = f"{tmp}/user-clicks", f"{tmp}/ckpt"
SCHEMA = "key string, ts timestamp, value double"


def emit(rows):  # the Emitter side: appends to the topic dataset
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(topic)


t0 = dt.datetime(2024, 1, 1)
emit([("alice", t0, 1.0), ("bob", t0, 1.0), ("alice", t0, 1.0)])

g = define_group(
    "mini-group",
    input_stream("user-clicks"),
    persist(AggFold({"clicks": F.count("*")})),
)
q = StreamingProcessor(g).start_table(
    {"user-clicks": stream_from_dir(spark, topic, SCHEMA)},
    queryName="clicks_view", checkpoint=ckpt)
q.processAllAvailable()
view1 = {r.key: r.clicks for r in spark.sql("select * from clicks_view").collect()}
print("after batch 1:", view1)
assert view1 == {"alice": 2, "bob": 1}

emit([("alice", t0, 1.0), ("carol", t0, 1.0)])   # more traffic arrives
q.processAllAvailable()
view2 = {r.key: r.clicks for r in spark.sql("select * from clicks_view").collect()}
print("after batch 2:", view2)
assert view2 == {"alice": 3, "bob": 1, "carol": 1}
q.stop()
print("OK")
