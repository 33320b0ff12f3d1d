"""Persisted dedup-signature store — the incremental-ingestion state.

:func:`goka_spark.functions.dedup.incremental_dedup` recomputes the
corpus signatures per call; at 100 TB that's a full corpus scan per
arriving batch.  The store makes the corpus side a PERSISTED ARTIFACT
(the same move ann_index.py makes for ANN quantizers/codes): md5 text
hashes and minhash LSH band keys are written ONCE as bucketed tables,
and every later batch probes them with

- no corpus re-scan (signatures read, text never touched again), and
- no corpus-side shuffle: the tables are bucketed by their join keys,
  so each probe join only shuffles the (small) batch into the
  corpus's bucket layout (operators/table_io.py, A24 co-location).

``append`` grows the store with a verdict batch's accepted documents
— the full ingestion loop: dedup batch N against state, admit the
novel docs, their signatures ARE the state batch N+1 probes.  That is
goka's processor contract (fold input into a persisted group table,
partition_table.go:1) applied to corpus curation, and it's why the
streaming face (:class:`DedupIngestSink`) is a foreachBatch sink over
the same two methods rather than a restricted stream-stream join.

Batches are assumed internally deduplicated (run ``exact_dedup`` /
``minhash_lsh_pairs`` within the batch first if they aren't):
``dedup_batch`` verdicts are strictly batch-vs-store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goka_spark.functions.dedup import band_keys, minhash_signatures


class SignatureStore:
    """Two bucketed tables under one name prefix:

    - ``<prefix>_md5``   (doc_id, h)   bucketed by h
    - ``<prefix>_bands`` (doc_id, bk)  bucketed by bk, where bk =
      "<band>:<band_key>" — the band index folds into ONE string so
      the probe join key equals the bucket key exactly (Spark only
      plans a co-located bucket join on an exact match)
    """

    def __init__(self, spark: SparkSession, prefix: str,
                 num_perm: int = 16, bands: int = 4, shingle: int = 3,
                 base_hash: str = "md5", buckets: int = 32):
        if num_perm % bands:
            raise ValueError("bands must divide num_perm")
        self.spark = spark
        self.prefix = prefix
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle, self.base_hash = shingle, base_hash
        self.buckets = buckets
        self.md5_table = f"{prefix}_md5"
        self.band_table = f"{prefix}_bands"

    # ------------------------------------------------------ signatures

    def _signatures(self, docs: DataFrame, id_col: str,
                    text_col: str) -> tuple[DataFrame, DataFrame]:
        md5s = docs.select(
            F.col(id_col).alias("doc_id"),
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"))
        # single-column band key (band index folded in) so the probe
        # join key EQUALS the bucket key — Spark only plans a
        # co-located bucket join when the two match exactly
        bnd = band_keys(
            minhash_signatures(docs, id_col, text_col, self.num_perm,
                               self.shingle, self.base_hash),
            id_col, self.bands, self.rows_per_band) \
            .select(F.col(id_col).alias("doc_id"),
                    F.concat_ws(":", F.col("band").cast("string"),
                                F.col("band_key")).alias("bk"))
        return md5s, bnd

    def _write(self, md5s: DataFrame, bnd: DataFrame, mode: str) -> None:
        (md5s.write.mode(mode).bucketBy(self.buckets, "h")
         .saveAsTable(self.md5_table))
        (bnd.write.mode(mode).bucketBy(self.buckets, "bk")
         .saveAsTable(self.band_table))
        # the write may run in a DIFFERENT session than later probes
        # (foreachBatch hands the sink a cloned session; each session
        # caches table file listings independently) — refresh in the
        # store's own session so its next read sees the new files
        for t in (self.md5_table, self.band_table):
            self.spark.catalog.refreshTable(t)

    def build(self, corpus: DataFrame, id_col: str, text_col: str) -> None:
        """One-time (or rebuild) signature pass over the corpus —
        the only moment the store ever scans corpus text."""
        md5s, bnd = self._signatures(corpus, id_col, text_col)
        self._write(md5s, bnd, "overwrite")

    def append(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Admit documents: append their signatures (same bucket
        spec, so probe joins stay co-located as the store grows)."""
        md5s, bnd = self._signatures(docs, id_col, text_col)
        self._write(md5s, bnd, "append")

    # ----------------------------------------------------------- probe

    def dedup_batch(self, batch: DataFrame, id_col: str,
                    text_col: str) -> DataFrame:
        """(id, verdict ∈ exact_dup | near_dup | new) per batch doc —
        identical semantics to ``incremental_dedup`` but the corpus
        side reads the persisted signature tables: bucketed scans,
        batch-side-only shuffle, corpus text untouched."""
        # single left-join + CASE plan (see incremental_dedup: the
        # 3-branch union re-embeds the signature subtrees and bloats
        # driver-side analysis)
        c_md5 = self.spark.table(self.md5_table).select("h")
        c_bnd = self.spark.table(self.band_table).select("bk")
        b_md5, b_bnd = self._signatures(batch, id_col, text_col)

        ex_ids = (b_md5.join(c_md5, "h", "left_semi")
                  .select(F.col("doc_id").alias(id_col),
                          F.lit(True).alias("_ex")))
        nr_ids = (b_bnd.join(c_bnd, "bk", "left_semi")
                  .select("doc_id").distinct()
                  .select(F.col("doc_id").alias(id_col),
                          F.lit(True).alias("_nr")))
        return (batch.select(id_col)
                .join(ex_ids, id_col, "left")
                .join(nr_ids, id_col, "left")
                .select(F.col(id_col),
                        F.when(F.col("_ex"), "exact_dup")
                         .when(F.col("_nr"), "near_dup")
                         .otherwise("new").alias("verdict")))

    def ingest(self, batch: DataFrame, id_col: str,
               text_col: str) -> DataFrame:
        """dedup_batch + admit the novel docs.  Returns the verdicts
        (materialized: the verdict read and the append both consume
        them, and the append must see pre-append state)."""
        verdicts = self.dedup_batch(batch, id_col, text_col) \
            .localCheckpoint(eager=True)
        fresh = batch.join(
            verdicts.filter(F.col("verdict") == "new").select(id_col),
            id_col, "left_semi")
        self.append(fresh, id_col, text_col)
        return verdicts

    def compact(self) -> dict:
        """Small-files maintenance (twin of ``ann_index.
        compact_index``): every ingest micro-batch appends one file
        per touched bucket, so a long-running ingestion loop degrades
        probe scans to thousands of tiny file opens.  Rewrite each
        signature table through a staging table hash-partitioned on
        its bucket key (repartition and bucketBy share Spark's
        Murmur3 ``hash() pmod n``, so every task holds whole buckets
        and the rewrite lands ~one file per bucket), then swap via
        catalog rename — the table NAME the probes join against never
        changes, and the bucket spec (and so the zero-exchange probe
        plan) is preserved.  Returns per-table row counts.

        Crash window: publish is DROP(tbl) then RENAME(staged → tbl)
        — a crash between the two leaves NO table under the production
        name (the data survives only in ``tbl_compacting``).  The
        window is self-healing: re-running ``compact()`` detects the
        orphan (staging exists, production missing) and finishes the
        interrupted rename before starting a new rewrite, so the
        recovery procedure is simply "run compact again".  Concurrent
        probes inside the window still fail on a missing table —
        single-writer maintenance op, like the ANN compactor."""
        stats = {}
        for tbl, key in ((self.md5_table, "h"), (self.band_table, "bk")):
            staged = f"{tbl}_compacting"
            if (self.spark.catalog.tableExists(staged)
                    and not self.spark.catalog.tableExists(tbl)):
                # orphan from a crash inside a previous publish:
                # the staging table IS the current data — promote it
                self.spark.sql(f"ALTER TABLE {staged} RENAME TO {tbl}")
                self.spark.catalog.refreshTable(tbl)
            self.spark.sql(f"DROP TABLE IF EXISTS {staged}")
            df = self.spark.table(tbl).repartition(self.buckets, F.col(key))
            (df.write.mode("overwrite").bucketBy(self.buckets, key)
             .saveAsTable(staged))
            stats[tbl] = self.spark.table(staged).count()
            self.spark.sql(f"DROP TABLE {tbl}")
            self.spark.sql(f"ALTER TABLE {staged} RENAME TO {tbl}")
            self.spark.catalog.refreshTable(tbl)
        return stats

    def drop(self) -> None:
        for t in (self.md5_table, self.band_table):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")


class DedupIngestSink:
    """Streaming face of the store: a ``foreachBatch`` sink that runs
    the full ingestion loop per micro-batch — verdicts written to
    ``out_path/epoch_id=N`` (overwrite-idempotent, the
    ExactlyOnceBatchSink layout), novel docs admitted into the store
    so the NEXT micro-batch dedups against them.  Batch semantics
    inside foreachBatch sidestep streaming-join restrictions (no
    stream-stream distinct/semi-join contortions), which is exactly
    what foreachBatch is for.

    ``gate`` (optional Boolean Column, e.g. ``text.blocklist_keep``
    or an entropy/quality predicate) runs BEFORE dedup — the real
    pipeline order: documents failing the gate are verdicted
    ``rejected`` and never probe or enter the store, so the state
    only ever holds documents worth keeping."""

    def __init__(self, store: SignatureStore, out_path: str,
                 id_col: str, text_col: str, gate=None):
        self.store, self.out_path = store, out_path
        self.id_col, self.text_col = id_col, text_col
        self.gate = gate

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self.gate is not None:
            ok = F.coalesce(self.gate, F.lit(False))
            passed = batch_df.filter(ok)
            rejected = (batch_df.filter(~ok)
                        .select(F.col(self.id_col),
                                F.lit("rejected").alias("verdict")))
            verdicts = self.store.ingest(
                passed, self.id_col, self.text_col).unionByName(rejected)
        else:
            verdicts = self.store.ingest(batch_df, self.id_col,
                                         self.text_col)
        (verdicts.write.mode("overwrite")
         .parquet(f"{self.out_path.rstrip('/')}/epoch_id={int(epoch_id)}"))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_path).drop("epoch_id")
