"""External key-value sink — the storage-builder port (examples/7-redis).

goka lets a processor swap its group-table storage for an external KV
store via ``WithStorageBuilder(storage.RedisBuilder(client, ns))``
(reference: examples/7-redis/consumer.go:45-48, storage/redis/redis.go):
the builder is invoked PER PARTITION and returns a Set/Get/Delete
store, keys are namespaced, and a nil value is a delete (tombstone).

Spark-first shape: the group table is a DataFrame/stream; exporting it
to an external KV store is a SINK, not a storage engine swap (Spark's
state store already covers processor-internal state).  The sink mirrors
the builder discipline for the 100 TB reason goka has it: the client
must be constructed ON THE EXECUTOR, once per partition — never
serialized from the driver, never one connection per row.

- ``kv_upsert_sink(builder)`` → a ``(batch_df, epoch_id)`` callable for
  ``foreachBatch`` (streaming) that also works on static frames: each
  partition builds its store, writes its rows as (namespaced key →
  value), deletes on NULL value, closes.  Partition-parallel, constant
  driver memory.
- ``DirKVStore`` — filesystem-backed store (one file per key): the
  in-container test double, and incidentally an object-store-shaped
  layout.  Works from executor processes (unlike an in-memory dict).
- ``RedisKVStore`` — the real thing, gated behind an import-try (no
  redis server/lib in this container); same namespacing as goka's
  redis storage (``<ns>:<key>``).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame


class KVStore:
    """Minimal store contract (storage/redis/redis.go Set/Get/Delete)."""

    def set(self, key: str, value: bytes) -> None:
        raise NotImplementedError

    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def keys(self) -> list[str]:
        raise NotImplementedError

    def close(self) -> None:
        pass


class DirKVStore(KVStore):
    """One file per key under ``root/namespace/`` — executor-safe test
    double with object-store layout.  Keys are hex-encoded so any
    string key is a valid filename.  Writes are tmp+rename: readers
    never observe a torn value (the same idempotent-rename discipline
    as ChangelogTable epochs)."""

    def __init__(self, root: str, namespace: str = "default"):
        self.dir = os.path.join(root, namespace)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key.encode().hex())

    def set(self, key: str, value: bytes) -> None:
        p = self._path(key)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(value)
        os.replace(tmp, p)

    def get(self, key: str) -> Optional[bytes]:
        try:
            with open(self._path(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def keys(self) -> list[str]:
        return sorted(bytes.fromhex(n).decode() for n in os.listdir(self.dir)
                      if not n.endswith(".tmp") and ".tmp." not in n)


class RedisKVStore(KVStore):
    """Redis-backed store, ``<ns>:<key>`` namespacing like goka's
    storage/redis.  Gated: raises ImportError where redis-py is absent
    (this container) — construct it inside the builder so only
    executors that actually run it need the lib."""

    def __init__(self, namespace: str = "default", **client_kwargs):
        import redis  # gated: not installed in this container

        self.ns = namespace
        self.client = redis.Redis(**client_kwargs)

    def _k(self, key: str) -> str:
        return f"{self.ns}:{key}"

    def set(self, key: str, value: bytes) -> None:
        self.client.set(self._k(key), value)

    def get(self, key: str) -> Optional[bytes]:
        return self.client.get(self._k(key))

    def delete(self, key: str) -> None:
        self.client.delete(self._k(key))

    def keys(self) -> list[str]:
        pre = f"{self.ns}:"
        return sorted(k.decode()[len(pre):]
                      for k in self.client.keys(f"{pre}*"))

    def close(self) -> None:
        self.client.close()


def kv_upsert_sink(builder: Callable[[], KVStore], key_col: str = "key",
                   value_col: str = "value"):
    """Build a ``foreachBatch``-compatible ``(df, epoch_id)`` writer.

    ``builder`` runs per partition on the executor (goka's
    StorageBuilder contract) — pass a picklable zero-arg factory, e.g.
    ``lambda: DirKVStore("/data/kv", "clicks")`` or
    ``lambda: RedisKVStore("clicks", host="...")``.  NULL value ⇒
    delete (goka tombstone, ctx.Delete).  Upserts are idempotent:
    replaying an epoch converges to the same store state, so the sink
    is exactly-once under foreachBatch's at-least-once replay."""

    def write(batch_df: DataFrame, epoch_id: int = 0) -> None:
        cols = batch_df.select(key_col, value_col)

        def per_partition(rows: Iterable) -> None:
            store = builder()
            try:
                for r in rows:
                    k, v = r[0], r[1]
                    if v is None:
                        store.delete(str(k))
                    else:
                        store.set(str(k), v if isinstance(v, (bytes, bytearray))
                                  else str(v).encode())
            finally:
                store.close()

        cols.foreachPartition(per_partition)

    return write
