"""The streaming TELEMETRY surfaces in one walkthrough — what an
ingest pipeline's ops dashboard reads while data flows:

  1. HllSink        — live distinct users per event type (registers
                      merge by MAX; stream ≡ batch),
  2. HistogramSink  — live value quantiles (bin counters merge by
                      SUM; same inverted-CDF readout as the batch
                      query),
  3. QualityGateSink — live per-gate pass rates over a document
                      stream (stateless verdicts, SUM-mergeable) —
                      rate DRIFT between epochs is the alarm for
                      upstream source changes.

All three sinks share the ExactlyOnceBatchSink epoch-directory
discipline (retry-idempotent whole-epoch overwrites) and a
SUM/MAX-monoid state layout, which is what makes shard-then-merge
exact — the property every stream≡batch test in tests/ pins.

Run: python examples/live_telemetry.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import get_session
from goka_spark.functions import corpus as C
from goka_spark.functions import dedup as D
from goka_spark.operators import windows as W
from goka_spark.streaming.runtime import stream_from_dir

spark = get_session("example-live-telemetry")
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp()

# ---- an event stream feeding HLL + histogram sinks -----------------
EV = "event_type string, user_id long, value double"
ev_src = f"{tmp}/events"
spark.createDataFrame(
    [("click", i % 40, float(i % 512)) for i in range(400)], EV
).coalesce(1).write.mode("append").parquet(ev_src)

hll = D.HllSink(f"{tmp}/hll", ["event_type"], "user_id")
hist = W.HistogramSink(f"{tmp}/hist", "value", ["event_type"],
                       lo=0.0, hi=512.0, n_bins=256)


def fanout(batch_df, epoch_id):
    hll(batch_df, epoch_id)
    hist(batch_df, epoch_id)


q = (stream_from_dir(spark, ev_src, EV).writeStream
     .foreachBatch(fanout)
     .option("checkpointLocation", f"{tmp}/ckpt-ev").start())
q.processAllAvailable()
spark.createDataFrame(
    [("click", 1000 + i, 500.0) for i in range(60)], EV
).coalesce(1).write.mode("append").parquet(ev_src)   # a user surge
q.processAllAvailable()
q.stop()

users = {r["event_type"]: r["hll_est"] for r in hll.estimate(spark).collect()}
quant = {r["event_type"]: (r["p50"], r["p90"])
         for r in hist.quantiles(spark).collect()}
print(f"live distinct users (HLL): {users}")
print(f"live value quantiles:      {quant}")

# ---- a document stream feeding the quality-gate sink ---------------
DOC = "doc_id long, text string"
doc_src = f"{tmp}/docs"
good = "the quick brown fox jumps over the lazy dog again and again"
spark.createDataFrame(
    [(i, good + f" t{i}") for i in range(50)], DOC
).coalesce(1).write.mode("append").parquet(doc_src)

gates = C.QualityGateSink(f"{tmp}/gates", "doc_id", "text")
q2 = (stream_from_dir(spark, doc_src, DOC).writeStream
      .foreachBatch(gates)
      .option("checkpointLocation", f"{tmp}/ckpt-doc").start())
q2.processAllAvailable()
# the upstream source rots: a burst of degenerate docs arrives
spark.createDataFrame(
    [(100 + i, "spam spam spam spam") for i in range(25)], DOC
).coalesce(1).write.mode("append").parquet(doc_src)
q2.processAllAvailable()
q2.stop()

rates = {r["gate"]: r["pass_e6"] / 1e6
         for r in gates.rates(spark).collect()}
print(f"live gate pass rates:      {rates}")
assert rates["blocklist"] < 1.0     # the drift the dashboard alarms on

spark.stop()
print("telemetry walkthrough OK")
