"""Mirror of goka examples/10-visit: a live stateful processor whose
keys can be visited while it runs — enumerate every live key's state
(VisitAllWithStats, processor.go:954), then run a MUTATING visit (the
reference's "reset" Visitor) by sending sentinel records through the
input topic, the same route goka's visit messages take through the
partition processor queue.

Run: python examples/visit.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import get_session
from goka_spark.streaming.runtime import stream_from_dir
from goka_spark.streaming.stateful import stateful_fold, visit_all_live

spark = get_session("example-visit")
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp()
src, ckpt = f"{work}/clicks", f"{work}/ckpt"
SCHEMA = "key string, ts timestamp, value long"

rows = [(f"key-{i % 3}", None, 1) for i in range(10)]
spark.createDataFrame(rows, SCHEMA).selectExpr(
    "key", "current_timestamp() as ts", "value"
).coalesce(1).write.mode("append").parquet(src)


# the fold: count clicks per key; value=RESET is the mutating visitor
def fold(state, row):
    if row.get("_reset"):
        return 0
    return (state or 0) + row["value"]


stream = stream_from_dir(spark, src, SCHEMA).withColumn(
    "_reset", F.col("value") < 0)
folded = stateful_fold(stream, "key", fold, "clicks long")
q = (folded.writeStream.queryName("visit_out").outputMode("update")
     .format("memory").option("checkpointLocation", ckpt).start())
q.processAllAvailable()

# --- VisitAllWithStats: every live key + state, no pause ---
visited = visit_all_live(spark, ckpt, "key", "clicks long").collect()
print(f"visited {len(visited)} values:",
      sorted((r.key, r.clicks) for r in visited))
assert {r.clicks for r in visited} == {4, 3}

# --- mutating visit ("reset"): sentinel records through the topic ---
resets = [(k, None, -1) for k in ("key-0", "key-1", "key-2")]
spark.createDataFrame(resets, SCHEMA).selectExpr(
    "key", "current_timestamp() as ts", "value"
).coalesce(1).write.mode("append").parquet(src)
q.processAllAvailable()

visited = visit_all_live(spark, ckpt, "key", "clicks long").collect()
print("after reset visit:", sorted((r.key, r.clicks) for r in visited))
assert {r.clicks for r in visited} == {0}

q.stop()
print("OK")
