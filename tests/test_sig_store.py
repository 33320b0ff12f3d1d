"""SignatureStore: persisted incremental-dedup state (build → probe →
append loop) + its streaming foreachBatch face."""

import pytest
from pyspark.sql import functions as F

from goka_spark.functions import dedup as D
from goka_spark.functions.sig_store import DedupIngestSink, SignatureStore
from goka_spark.queries.base import load


@pytest.fixture()
def store(spark):
    s = SignatureStore(spark, "t_sig_store")
    yield s
    s.drop()


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_matches_adhoc_incremental(spark, sf_dir, store):
    """Persisted-store verdicts ≡ the ad-hoc incremental_dedup on the
    same split — the store is an IO optimization, not new semantics."""
    docs = load(spark, sf_dir, "documents")["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    store.build(corpus, "doc_id", "text")
    got = {r["doc_id"]: r["verdict"]
           for r in store.dedup_batch(batch, "doc_id", "text").collect()}
    want = {r["doc_id"]: r["verdict"]
            for r in D.incremental_dedup(batch, corpus,
                                         "doc_id", "text").collect()}
    assert got == want


def test_ingest_loop_admits_then_blocks(spark, store):
    """The loop property: a novel doc admitted in batch N becomes a
    duplicate for batch N+1."""
    store.build(_df(spark, [(1, "seed corpus document about spark plans")]),
                "doc_id", "text")
    novel = "a completely novel document about bloom filters today"
    v1 = {r["doc_id"]: r["verdict"] for r in
          store.ingest(_df(spark, [(10, novel)]), "doc_id", "text").collect()}
    assert v1 == {10: "new"}
    v2 = {r["doc_id"]: r["verdict"] for r in
          store.ingest(_df(spark, [(20, novel)]), "doc_id", "text").collect()}
    assert v2 == {20: "exact_dup"}


def test_ingest_does_not_admit_duplicates(spark, store):
    """exact/near dup docs must NOT grow the store."""
    store.build(_df(spark, [(1, "seed corpus document about spark plans")]),
                "doc_id", "text")
    store.ingest(_df(spark, [(10, "seed corpus document about spark plans")]),
                 "doc_id", "text")
    assert spark.table(store.md5_table).count() == 1  # still just the seed


def test_probe_join_corpus_side_unshuffled(spark, sf_dir, store):
    """The A24 payoff: in the shuffled-join regime (the 100 TB case —
    at test scale the planner broadcasts the batch and rightly skips
    bucketing), the store scan's bucketing satisfies the probe join:
    bucketed scans, and no Exchange above them."""
    docs = load(spark, sf_dir, "documents")["documents"]
    store.build(docs.filter(F.col("doc_id") % 10 != 0), "doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = store.dedup_batch(batch, "doc_id", "text")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    bucketed_scans = [l for l in plan.splitlines()
                      if "FileScan" in l and "t_sig_store" in l]
    assert bucketed_scans, plan
    for line in bucketed_scans:
        assert "Bucketed: true" in line, line


def test_streaming_ingest_sink(spark, tmp_path, store):
    """Live loop via foreachBatch: micro-batch 2's duplicate of a
    micro-batch 1 doc is flagged, novel docs keep flowing in."""
    from goka_spark.streaming.runtime import stream_from_dir

    store.build(_df(spark, [(1, "seed corpus document about spark plans")]),
                "doc_id", "text")
    src = str(tmp_path / "topic")
    schema = "doc_id long, text string"
    _df(spark, [(10, "first wave document with fresh content here")]) \
        .coalesce(1).write.mode("append").parquet(src)

    sink = DedupIngestSink(store, str(tmp_path / "verdicts"),
                           "doc_id", "text")
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        _df(spark, [(20, "first wave document with fresh content here"),
                    (21, "second wave totally different subject matter")]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"]: r["verdict"] for r in sink.read(spark).collect()}
    assert got[10] == "new"
    assert got[20] == "exact_dup"  # dup of batch-1's admitted doc
    assert got[21] == "new"


def test_streaming_ingest_sink_with_quality_gate(spark, tmp_path, store):
    """The gated loop runs the real pipeline order — quality gate
    BEFORE dedup: rejected docs are verdicted without probing and
    never enter the store, so a later clean duplicate of a rejected
    doc is NOT flagged (the junk never became state)."""
    from goka_spark.functions.text import blocklist_keep
    from goka_spark.streaming.runtime import stream_from_dir

    store.build(_df(spark, [(1, "seed corpus document about spark plans")]),
                "doc_id", "text")
    src = str(tmp_path / "topic_gated")
    schema = "doc_id long, text string"
    _df(spark, [(10, "badword badword badword spam spam"),
                (11, "a perfectly clean document about joins")]) \
        .coalesce(1).write.mode("append").parquet(src)

    sink = DedupIngestSink(
        store, str(tmp_path / "verdicts_gated"), "doc_id", "text",
        gate=blocklist_keep(F.col("text"), ["badword"],
                            max_ratio_e6=50_000))
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt_gated"))
         .start())
    try:
        q.processAllAvailable()
        _df(spark, [(20, "badword badword badword spam spam"),
                    (21, "a perfectly clean document about joins")]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"]: r["verdict"] for r in sink.read(spark).collect()}
    assert got[10] == "rejected"
    assert got[11] == "new"
    assert got[20] == "rejected"      # gated again, not exact_dup —
    assert got[21] == "exact_dup"     # junk never entered the store


def test_compact_preserves_contents_verdicts_and_bucketing(spark, sf_dir, store):
    """Compaction is an IO rewrite, not new semantics: table contents
    and probe verdicts are unchanged, the file count drops to ~one
    per bucket, and the probe scan stays bucketed (zero-exchange
    regime preserved)."""
    import os

    docs = load(spark, sf_dir, "documents")["documents"]
    store.build(docs.filter(F.col("doc_id") % 10 == 5), "doc_id", "text")
    for m in (6, 7, 8):                       # fragment: 3 append files/bucket
        store.append(docs.filter(F.col("doc_id") % 10 == m),
                     "doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    def table_files(tbl):
        loc = spark.sql(f"DESCRIBE EXTENDED {tbl}").filter(
            "col_name = 'Location'").first()["data_type"]
        path = loc.replace("file:", "")
        return sum(1 for _, _, fs in os.walk(path)
                   for f in fs if f.endswith(".parquet") or "part-" in f)

    before_rows = sorted(map(tuple, spark.table(store.md5_table).collect()))
    before_verdicts = sorted(map(tuple, store.dedup_batch(
        batch, "doc_id", "text").collect()))
    files_before = table_files(store.md5_table)

    stats = store.compact()

    assert stats[store.md5_table] == len(before_rows)
    assert sorted(map(tuple, spark.table(store.md5_table).collect())) \
        == before_rows
    assert sorted(map(tuple, store.dedup_batch(
        batch, "doc_id", "text").collect())) == before_verdicts
    assert table_files(store.md5_table) < files_before

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = store.dedup_batch(batch, "doc_id", "text")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "t_sig_store" in l]
    assert scans and all("Bucketed: true" in l for l in scans), plan


def test_compact_self_heals_orphaned_staging(spark, store):
    """Crash-window recovery (ADVICE r7): a crash between compact's
    DROP(tbl) and RENAME(staged → tbl) leaves the data only under
    ``tbl_compacting``.  Re-running compact() must detect the orphan,
    finish the interrupted publish, and leave verdicts identical —
    the documented recovery procedure is "run compact again"."""
    store.build(_df(spark, [(1, "seed corpus document about spark plans"),
                            (2, "another unrelated seed about joins")]),
                "doc_id", "text")
    batch = _df(spark, [(9, "seed corpus document about spark plans"),
                        (10, "a brand new document about bloom filters")])
    want = sorted(map(tuple, store.dedup_batch(
        batch, "doc_id", "text").collect()))

    # simulate the crash: production name gone, data stranded in the
    # staging table (exactly the state after DROP, before RENAME)
    for tbl in (store.md5_table, store.band_table):
        spark.sql(f"ALTER TABLE {tbl} RENAME TO {tbl}_compacting")
        assert not spark.catalog.tableExists(tbl)

    stats = store.compact()                      # heals, then compacts
    assert stats[store.md5_table] == 2
    assert sorted(map(tuple, store.dedup_batch(
        batch, "doc_id", "text").collect())) == want
    for tbl in (store.md5_table, store.band_table):
        assert spark.catalog.tableExists(tbl)
        assert not spark.catalog.tableExists(f"{tbl}_compacting")
