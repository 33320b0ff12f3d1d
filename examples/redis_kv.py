"""Mirror of goka examples/7-redis (consumer.go:34-49 storage-builder
wiring, producer.go event emit): key the click stream by user, fold a
per-user state, and export the group table to an EXTERNAL key-value
store through a per-partition store builder —
``WithStorageBuilder(storage.RedisBuilder(client, namespace))`` in
goka, ``kv_upsert_sink(builder)`` here.

No redis server exists in this container, so the builder constructs
the filesystem-backed ``DirKVStore`` (same contract); swap the lambda
for ``RedisKVStore(namespace, host=...)`` on a real deployment.

Run: python examples/redis_kv.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import get_session
from goka_spark.operators.kv_sink import DirKVStore, kv_upsert_sink

spark = get_session("example-redis-kv")
root = tempfile.mkdtemp()
NS = "user-events"

# the producer side: events keyed by user id (producer.go Emit loop)
events = spark.createDataFrame(
    [(u, t) for u in range(5) for t in range(u + 1)],
    "user_id long, seq long")

# the processor fold: per-user latest state (Persist(codec) table)
table = (events.groupBy(F.col("user_id").cast("string").alias("key"))
         .agg(F.max("seq").alias("last_seq"), F.count("*").alias("cnt"))
         .select("key", F.to_json(F.struct("last_seq", "cnt")).alias("value")))

# export through the per-partition store builder
sink = kv_upsert_sink(lambda: DirKVStore(root, NS))
sink(table, epoch_id=0)

store = DirKVStore(root, NS)
print("keys:", store.keys())
assert store.keys() == ["0", "1", "2", "3", "4"]
assert b'"cnt":5' in store.get("4")

# tombstone: NULL value deletes the key (ctx.Delete)
tomb = spark.createDataFrame([("0", None)], "key string, value string")
sink(tomb, epoch_id=1)
assert store.get("0") is None and store.keys() == ["1", "2", "3", "4"]
print("OK")
