"""Incremental corpus ingestion — the 100 TB curation loop in
miniature: a seed corpus's dedup signatures persist ONCE as bucketed
tables (SignatureStore), then document batches stream in; each
micro-batch is deduplicated against the store (exact md5 + minhash
LSH band probes — no corpus re-scan), novel docs are admitted so the
NEXT batch dedups against them, and verdicts land per epoch.

Run: python examples/incremental_ingest.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from goka_spark import get_session
from goka_spark.functions.sig_store import DedupIngestSink, SignatureStore
from goka_spark.streaming.runtime import stream_from_dir

spark = get_session("example-incremental-ingest")
tmp = tempfile.mkdtemp()
topic = f"{tmp}/doc-batches"
SCHEMA = "doc_id long, text string"


def emit(rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(topic)


store = SignatureStore(spark, "example_ingest_sig")
store.build(spark.createDataFrame(
    [(1, "the seed corpus talks about spark query planning today"),
     (2, "another seed document about kafka consumer group rebalancing")],
    SCHEMA), "doc_id", "text")

emit([(10, "the seed corpus talks about spark query planning today"),   # exact dup
      (11, "a brand new document about bloom filter decontamination")])  # novel

sink = DedupIngestSink(store, f"{tmp}/verdicts", "doc_id", "text")
q = (stream_from_dir(spark, topic, SCHEMA).writeStream
     .foreachBatch(sink)
     .option("checkpointLocation", f"{tmp}/ckpt")
     .start())
q.processAllAvailable()

# batch 2: a near-dup of the doc ADMITTED in batch 1 — the loop catches it
emit([(20, "a brand new document about bloom filter decontamination etc"),
      (21, "completely unrelated closing document about window functions")])
q.processAllAvailable()
q.stop()

for r in sink.read(spark).orderBy("doc_id").collect():
    print(f"doc {r['doc_id']:>3}  {r['verdict']}")
store.drop()
spark.stop()
