"""Codec scalar + column roundtrips (mirrors codec/codec.go tests)."""

from pyspark.sql import functions as F

from goka_spark import BytesCodec, Int64Codec, JsonCodec, StringCodec


def test_scalar_roundtrips():
    assert StringCodec().decode(StringCodec().encode("héllo")) == "héllo"
    assert Int64Codec().decode(Int64Codec().encode(-42)) == -42
    assert Int64Codec().encode(1) == b"\x00" * 7 + b"\x01"
    assert BytesCodec().decode(BytesCodec().encode(b"xyz")) == b"xyz"
    jc = JsonCodec("a long, b string")
    assert jc.decode(jc.encode({"a": 1, "b": "x"})) == {"a": 1, "b": "x"}


def test_column_roundtrips(spark):
    df = spark.createDataFrame(
        [(5, "x"), (123456789, "y"), (-42, "z"), (-(2**62), "w")],
        "n long, s string")
    ic, sc = Int64Codec(), StringCodec()
    out = df.select(
        ic.decode_col(ic.encode_col(F.col("n"))).alias("n2"),
        sc.decode_col(sc.encode_col(F.col("s"))).alias("s2"),
    ).collect()
    assert [(r.n2, r.s2) for r in out] == [
        (5, "x"), (123456789, "y"), (-42, "z"), (-(2**62), "w")]


def test_json_column_roundtrip(spark):
    jc = JsonCodec("a long, b string")
    df = spark.createDataFrame([((1, "x"),)], "v struct<a:long,b:string>")
    out = df.select(jc.decode_col(jc.encode_col(F.col("v"))).alias("v")).first()
    assert out.v.a == 1 and out.v.b == "x"
