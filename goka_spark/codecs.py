"""Codecs — serialization boundary, mirroring goka's Codec interface.

goka codecs (reference: /root/reference/codec.go:3-7 and
/root/reference/codec/codec.go) turn values into ``[]byte`` at every
Kafka boundary.  Spark-first, a codec is primarily a *schema*: data
stays in Tungsten's columnar/binary layout and is only materialized
to bytes at genuine binary boundaries (emitting to a byte-oriented
sink, multimodal blobs).  Each codec therefore exposes

- ``spark_type`` — the Spark DataType the decoded value occupies,
- ``encode_col`` / ``decode_col`` — **JVM-side** Column expressions
  (no Python in the hot path),
- ``encode`` / ``decode`` — driver-side scalar helpers for parity
  with goka's API and for tests.
"""

from __future__ import annotations

import json
import struct
from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Codec(ABC):
    """Encode/decode between a typed value and bytes (goka codec.go:3-7)."""

    spark_type: T.DataType

    @abstractmethod
    def encode(self, value: Any) -> bytes: ...

    @abstractmethod
    def decode(self, data: bytes) -> Any: ...

    def encode_col(self, col: Column) -> Column:
        raise NotImplementedError

    def decode_col(self, col: Column) -> Column:
        raise NotImplementedError


class BytesCodec(Codec):
    """Pass-through bytes (goka codec/codec.go Bytes)."""

    spark_type = T.BinaryType()

    def encode(self, value: Any) -> bytes:
        return bytes(value)

    def decode(self, data: bytes) -> Any:
        return data

    def encode_col(self, col: Column) -> Column:
        return col.cast("binary")

    def decode_col(self, col: Column) -> Column:
        return col


class StringCodec(Codec):
    """UTF-8 strings (goka codec/codec.go String)."""

    spark_type = T.StringType()

    def encode(self, value: Any) -> bytes:
        return str(value).encode("utf-8")

    def decode(self, data: bytes) -> Any:
        return data.decode("utf-8")

    def encode_col(self, col: Column) -> Column:
        return F.encode(col, "UTF-8")

    def decode_col(self, col: Column) -> Column:
        return F.decode(col, "UTF-8")


class Int64Codec(Codec):
    """Big-endian int64, matching goka's binary encoding width."""

    spark_type = T.LongType()

    def encode(self, value: Any) -> bytes:
        return struct.pack(">q", int(value))

    def decode(self, data: bytes) -> Any:
        return struct.unpack(">q", data)[0]

    def encode_col(self, col: Column) -> Column:
        # JVM-side: hex string of the 8-byte big-endian value → unhex.
        return F.unhex(F.lpad(F.hex(col.cast("long")), 16, "0"))

    def decode_col(self, col: Column) -> Column:
        # negative toBase = signed two's-complement interpretation, so
        # negative longs round-trip (unsigned conv would overflow long).
        return F.conv(F.hex(col), 16, -10).cast("long")


class JsonCodec(Codec):
    """JSON documents with a declared Spark schema (user codecs in goka
    are typically JSON — e.g. examples/3-messaging MessageCodec)."""

    def __init__(self, schema: T.StructType | str):
        self._schema = schema

    @property
    def spark_type(self) -> T.DataType:  # lazy: DDL parsing needs the JVM
        if isinstance(self._schema, str):
            self._schema = T._parse_datatype_string(self._schema)
        return self._schema

    def encode(self, value: Any) -> bytes:
        return json.dumps(value, sort_keys=True).encode("utf-8")

    def decode(self, data: bytes) -> Any:
        return json.loads(data.decode("utf-8"))

    def encode_col(self, col: Column) -> Column:
        return F.encode(F.to_json(col), "UTF-8")

    def decode_col(self, col: Column) -> Column:
        return F.from_json(F.decode(col, "UTF-8"), self.spark_type)


class SchemaRegistryCodec(Codec):
    """Schema-registry framing: the documented Confluent wire format —
    one magic byte ``0x00``, a big-endian 4-byte schema id, then the
    payload — wrapped around any inner codec.  This is the codec shape
    real Kafka users plug into goka's Codec seam (codec.go:3-7) when
    their topics carry registry-framed values; the framing is pure
    public wire format, so it round-trips and contract-tests without a
    broker, exactly like the kafka wire-schema contract
    (tests/test_kafka_contract.py).

    ``decode``/``decode_col`` REJECT frames with the wrong magic byte
    or a different schema id (scalar: ValueError; column: NULL — the
    declarative equivalent, filterable upstream) rather than guessing
    at payload bytes.
    """

    MAGIC = 0x00

    def __init__(self, schema_id: int, inner: Codec):
        if not 0 <= schema_id <= 0xFFFFFFFF:
            raise ValueError(f"schema id out of u32 range: {schema_id}")
        self.schema_id = schema_id
        self.inner = inner
        self._prefix = struct.pack(">BI", self.MAGIC, schema_id)

    @property
    def spark_type(self) -> T.DataType:
        return self.inner.spark_type

    def encode(self, value: Any) -> bytes:
        return self._prefix + self.inner.encode(value)

    def decode(self, data: bytes) -> Any:
        if len(data) < 5 or data[0] != self.MAGIC:
            raise ValueError("not a schema-registry frame (bad magic)")
        sid = struct.unpack(">I", data[1:5])[0]
        if sid != self.schema_id:
            raise ValueError(
                f"schema id mismatch: frame has {sid}, codec expects "
                f"{self.schema_id}")
        return self.inner.decode(data[5:])

    def encode_col(self, col: Column) -> Column:
        return F.concat(F.lit(self._prefix),
                        self.inner.encode_col(col))

    def decode_col(self, col: Column) -> Column:
        # substring on BinaryType slices bytes JVM-side; a frame whose
        # 5-byte header mismatches decodes to NULL, never to garbage
        return F.when(
            F.substring(col, 1, 5) == F.lit(self._prefix),
            self.inner.decode_col(F.substring(col, 6, 2_147_483_647)),
        )


class SchemaRegistry:
    """Minimal in-process registry with the standard subject → id
    contract (register is idempotent per (subject, schema) like the
    HTTP registry's POST /subjects/:s/versions).  Stands in for a
    live registry in tests; on a real deployment the id assignment
    comes from the service and ``codec_for`` is constructed the same
    way."""

    def __init__(self):
        self._ids: dict[tuple[str, str], int] = {}
        self._by_subject: dict[str, list[int]] = {}

    def register(self, subject: str, schema_ddl: str) -> int:
        key = (subject, schema_ddl)
        if key not in self._ids:
            self._ids[key] = len(self._ids) + 1
            self._by_subject.setdefault(subject, []).append(self._ids[key])
        return self._ids[key]

    def latest(self, subject: str) -> int:
        return self._by_subject[subject][-1]

    def codec_for(self, subject: str, schema_ddl: str) -> SchemaRegistryCodec:
        return SchemaRegistryCodec(self.register(subject, schema_ddl),
                                   JsonCodec(schema_ddl))
