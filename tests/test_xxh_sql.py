"""XXH64-in-SQL (queries/xxh_sql.py): the generated DuckDB SQL must
equal a pure-Python XXH64 reference AND Spark's xxhash64 on boundary
lengths — empty, sub-lane, lane-aligned, 31/32/33 (stripe threshold),
and multi-stripe strings — plus seeded folds (Spark's array-hash
semantics)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from goka_spark.queries import xxh_sql as XS

M = (1 << 64) - 1
P1, P2, P3 = XS.P1, XS.P2, XS.P3
P4, P5 = XS.P4, XS.P5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def rnd(acc, lane):
    return (rotl((acc + lane * P2) & M, 31) * P1) & M


def xxh64(data: bytes, seed: int) -> int:
    n, i = len(data), 0
    if n >= 32:
        a = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M,
             (seed - P1) & M]
        while i + 32 <= n:
            for k in range(4):
                a[k] = rnd(a[k], int.from_bytes(data[i:i + 8], "little"))
                i += 8
        h = (rotl(a[0], 1) + rotl(a[1], 7) + rotl(a[2], 12)
             + rotl(a[3], 18)) & M
        for k in range(4):
            h = ((h ^ rnd(0, a[k])) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i:i + 8], "little")),
                  27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * P1)
                       & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    return h ^ (h >> 32)


def signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


BOUNDARY = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "hello world",
            "x" * 31, "x" * 32, "x" * 33, "q" * 63, "q" * 64, "q" * 65,
            "a bit longer string crossing 64 and 96 byte stripe "
            "boundaries with room to spare, definitely over ninety-six!"]


def test_sql_matches_python_reference():
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(BOUNDARY)) + ") v(id, s)")
    sql = XS.xxh64_select("SELECT id, s FROM t", "s", "h", ["id", "s"],
                          max_len=130)
    for _, s, h in con.sql(sql).fetchall():
        assert int(h) == xxh64(s.encode(), 42), repr(s)


def test_sql_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(BOUNDARY)],
                               "id long, s string")
    got = {r.s: r.h for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(BOUNDARY)) + ") v(id, s)")
    sql = XS.xxh64_select("SELECT id, s FROM t", "s", "h", ["id", "s"],
                          max_len=130)
    for _, s, h in con.sql(sql).fetchall():
        assert signed(int(h)) == got[s], repr(s)


def test_seeded_fold_matches_spark_array_hash(spark):
    """Spark hashes array<string> as a sequential fold: element k's
    XXH64 is seeded by element k-1's result."""
    arr = ["17", "123456789", "2147483646"]
    want = spark.createDataFrame([(arr,)], "a array<string>") \
        .select(F.xxhash64("a").alias("h")).collect()[0].h
    h = 42
    for el in arr:
        h = xxh64(el.encode(), h)
    assert signed(h) == want

    con = duckdb.connect()
    con.sql("CREATE TABLE seeds AS SELECT 42::UBIGINT AS sd")
    acc = 42
    for el in arr:
        sql = XS.xxh64_select(
            f"SELECT {acc}::UBIGINT AS sd, '{el}' AS s FROM seeds",
            "s", "h", ["sd", "s"], seed="sd", max_len=20)
        acc = int(con.sql(sql).fetchone()[2])
    assert signed(acc) == want
