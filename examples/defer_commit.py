"""Mirror of goka examples/9-defer-commit (main.go:98
ctx.DeferCommit): the input offset is only committed once the
downstream write durably lands, so a crash in between replays the
message WITHOUT duplicating its effect.

Spark analog: Structured Streaming replays the whole micro-batch
epoch after a crash; ExactlyOnceBatchSink makes the replay a no-op
(per-epoch directory + committed-epoch ledger), which is exactly the
defer-commit contract — at-least-once delivery upstream, effectively
exactly-once effects downstream.

Run: python examples/defer_commit.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from goka_spark import get_session
from goka_spark.streaming.runtime import ExactlyOnceBatchSink

spark = get_session("example-defer-commit")
out = tempfile.mkdtemp() + "/out"

sink = ExactlyOnceBatchSink(out)
batch = spark.createDataFrame([("msg-1", 1.0), ("msg-2", 2.0)],
                              "key string, v double")

sink(batch, epoch_id=0)       # first delivery: commit succeeds
sink(batch, epoch_id=0)       # crash-replay of the SAME epoch: no-op
sink(batch.replace(1.0, 3.0), epoch_id=1)  # next epoch: lands

rows = spark.read.parquet(out + "/data").count()
print("rows after replay:", rows)
assert rows == 4  # 2 per committed epoch — the replayed epoch wrote nothing
print("OK")
