"""View — queryable materialized table (goka view.go:55-484).

A goka View tails a table topic into local storage and serves
Get/Has/Iterator/IteratorWithRange.  Spark-first, a View wraps the
group-table DataFrame (or a parquet dataset of it): point reads are
key-filters (pushed down to the scan when backed by files), range
scans are range filters + sort.  For *serving* workloads at scale the
table would be written to a key-partitioned sink; here the same API
works on any DataFrame.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class View:
    def __init__(self, table: DataFrame | str, key_col: str = "key",
                 spark: Optional[SparkSession] = None):
        if isinstance(table, str):
            spark = spark or SparkSession.getActiveSession()
            table = spark.read.parquet(table)
        self.df = table
        self.key_col = key_col

    def get(self, key: Any) -> Optional[dict]:
        """View.Get (view.go:333): state for one key, or None."""
        rows = self.df.filter(F.col(self.key_col) == F.lit(key)).limit(1).collect()
        if not rows:
            return None
        d = rows[0].asDict(recursive=True)
        d.pop(self.key_col, None)
        return d

    def has(self, key: Any) -> bool:
        """View.Has (view.go:363)."""
        return bool(self.df.filter(F.col(self.key_col) == F.lit(key)).limit(1).take(1))

    def iterator(self) -> Iterator[tuple[Any, dict]]:
        """View.Iterator (view.go:374): all (key, state), key-ordered.

        Streams partitions to the driver one at a time
        (toLocalIterator) — no full collect.
        """
        for row in self.df.orderBy(self.key_col).toLocalIterator():
            d = row.asDict(recursive=True)
            k = d.pop(self.key_col)
            yield k, d

    def iterator_range(self, start: Any, limit: Any) -> Iterator[tuple[Any, dict]]:
        """View.IteratorWithRange (view.go:397): keys in [start, limit)."""
        df = self.df.filter(F.col(self.key_col) >= F.lit(start))
        if limit is not None:
            df = df.filter(F.col(self.key_col) < F.lit(limit))
        for row in df.orderBy(self.key_col).toLocalIterator():
            d = row.asDict(recursive=True)
            k = d.pop(self.key_col)
            yield k, d

    def seek(self, key: Any) -> Iterator[tuple[Any, dict]]:
        """Iterator.Seek (iterator.go:66, storage/iterator.go:43):
        position the cursor at the first key >= ``key`` and scan
        forward in key order.  The predicate pushes down to the scan
        (file-backed views skip row groups below the seek key)."""
        df = self.df.filter(F.col(self.key_col) >= F.lit(key))
        for row in df.orderBy(self.key_col).toLocalIterator():
            d = row.asDict(recursive=True)
            k = d.pop(self.key_col)
            yield k, d

    def evict(self, key: Any) -> "View":
        """View.Evict (view.go:421) — returns a View without the key
        (immutable DataFrames: eviction is a filter, not a mutation)."""
        return View(self.df.filter(F.col(self.key_col) != F.lit(key)), self.key_col)

    def range_df(self, start: Any, limit: Any) -> DataFrame:
        """Declarative range scan (stays distributed)."""
        df = self.df.filter(F.col(self.key_col) >= F.lit(start))
        if limit is not None:
            df = df.filter(F.col(self.key_col) < F.lit(limit))
        return df.orderBy(self.key_col)
