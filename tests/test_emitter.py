"""Emitter semantics (mirrors emitter_test.go)."""

from goka_spark import Emitter, Int64Codec


def test_emit_buffered_then_finish(spark, tmp_path):
    path = str(tmp_path / "topic")
    em = Emitter(spark, path, codec=Int64Codec())
    em.emit("a", 1)
    em.emit("b", 2)
    assert not em.exists()  # nothing flushed yet (async Emit semantics)
    em.finish()
    got = {r.key: r.value for r in em.read().collect()}
    assert got == {"a": 1, "b": 2}


def test_emit_sync_immediate(spark, tmp_path):
    path = str(tmp_path / "topic")
    em = Emitter(spark, path, codec=Int64Codec())
    em.emit_sync("k", 9)
    assert em.read().count() == 1


def test_emit_dataframe_append(spark, tmp_path):
    path = str(tmp_path / "topic")
    em = Emitter(spark, path)
    df = spark.createDataFrame([("a", 1.0)], "key string, value double")
    em.emit_dataframe(df)
    em.emit_dataframe(df)
    assert em.read().count() == 2
