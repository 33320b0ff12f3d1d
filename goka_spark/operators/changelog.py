"""Changelog topics — goka's compacted table topic, on a data lake.

goka persists every SetValue to ``<group>-table``, a Kafka topic with
``cleanup.policy=compact`` (graph.go:44-46); recovery replays it and
keeps the last record per key; tombstones (nil values) delete keys
(partition_table.go).  The lake-native equivalent:

- ``append_delta``   — write a batch of (key, state, tombstone) rows
  stamped with a monotonically increasing epoch (the "offset"),
- ``read_compacted`` — reconstruct the current table: latest epoch per
  key wins, tombstoned keys drop (log compaction as a query:
  one hash-aggregate ``max_by(struct(state), epoch)``),
- ``compact``        — rewrite the log as its compacted form (what
  Kafka's log cleaner does in the background).

Epoch files make replay deterministic and the write path append-only —
the same recovery contract goka's processor relies on.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangelogTable:
    def __init__(self, spark: SparkSession, path: str, key_col: str = "key"):
        self.spark = spark
        self.path = path
        self.key_col = key_col

    def _next_epoch(self) -> int:
        if not os.path.exists(self.path):
            return 0
        epochs = [int(d.split("=")[1]) for d in os.listdir(self.path)
                  if d.startswith("_epoch=")]
        return max(epochs, default=-1) + 1

    def append_delta(self, delta: DataFrame, tombstone: Optional[str] = None) -> int:
        """Append one batch of upserts (goka: produced SetValue records).
        ``tombstone`` names a boolean column marking deletes."""
        epoch = self._next_epoch()
        out = delta.withColumn(
            "_tombstone",
            F.col(tombstone) if tombstone else F.lit(False))
        out.write.mode("overwrite").parquet(f"{self.path}/_epoch={epoch}")
        return epoch

    def _log(self) -> DataFrame:
        df = self.spark.read.option("basePath", self.path).parquet(
            f"{self.path}/_epoch=*")
        return df

    def read_compacted(self) -> DataFrame:
        """Current table state: last write per key wins; tombstones drop
        the key.  One hash aggregate — no sort, no window."""
        log = self._log()
        state_cols = [c for c in log.columns
                      if c not in (self.key_col, "_tombstone", "_epoch")]
        picked = F.max_by(
            F.struct(F.col("_tombstone"), *[F.col(c) for c in state_cols]),
            F.col("_epoch"),
        )
        latest = log.groupBy(self.key_col).agg(picked.alias("_s"))
        return (
            latest.filter(~F.col("_s._tombstone"))
            .select(self.key_col, *[F.col(f"_s.{c}").alias(c) for c in state_cols])
        )

    def compact(self) -> None:
        """Rewrite the log as one compacted epoch (Kafka log cleaner)."""
        table = self.read_compacted().cache()
        table.count()  # materialize before deleting source epochs
        epoch = self._next_epoch()
        table.withColumn("_tombstone", F.lit(False)).write.mode("overwrite") \
            .parquet(f"{self.path}/_epoch={epoch}")
        import shutil

        for d in os.listdir(self.path):
            if d.startswith("_epoch=") and int(d.split("=")[1]) != epoch:
                shutil.rmtree(os.path.join(self.path, d))
        table.unpersist()
