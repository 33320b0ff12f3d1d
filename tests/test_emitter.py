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


def test_emit_with_headers_roundtrip(spark, tmp_path):
    """EmitWithHeaders (emitter.go:60) → headers ride the topic schema
    as map<string,binary> (headers.go:8) and read back natively."""
    from pyspark.sql import functions as F

    from goka_spark.headers import header_long, header_string

    path = str(tmp_path / "topic")
    em = Emitter(spark, path, codec=Int64Codec())
    em.emit("a", 1, headers={"trace": b"t-123", "n": b"7"})
    em.emit("b", 2)  # headerless record in the same flush → NULL map
    em.finish()
    got = {r.key: (r.trace, r.n) for r in em.read().select(
        "key",
        header_string("trace").alias("trace"),
        header_long("n").alias("n"),
    ).collect()}
    assert got == {"a": ("t-123", 7), "b": (None, None)}
    assert dict(em.read().dtypes)["headers"] == "map<string,binary>"


def test_emitter_default_headers_merge(spark, tmp_path):
    """goka WithEmitterDefaultHeaders (options.go:625): defaults attach
    to every emit; per-emit headers win on key collision."""
    from goka_spark.operators.emitter import Emitter

    em = Emitter(spark, str(tmp_path / "t"),
                 default_headers={"src": b"emitter", "v": b"1"})
    em.emit("a", "x")
    em.emit("b", "y", headers={"v": b"2"})
    em.finish()
    got = {r.key: dict(r.headers) for r in em.read().collect()}
    assert got["a"] == {"src": b"emitter", "v": b"1"}
    assert got["b"] == {"src": b"emitter", "v": b"2"}


def test_emit_after_finish_rejected(spark, tmp_path):
    """errors.go:11 ErrEmitterAlreadyClosed / emitter.go:79: Finish
    closes — later emits raise; EmitSync only flushes and leaves the
    emitter usable (matching the Go API split)."""
    import pytest

    from goka_spark.operators.emitter import EmitterAlreadyClosedError

    em = Emitter(spark, str(tmp_path / "topic"), codec=Int64Codec())
    em.emit_sync("a", 1)
    em.emit_sync("b", 2)                 # EmitSync does not close
    em.finish()
    with pytest.raises(EmitterAlreadyClosedError):
        em.emit("c", 3)
    with pytest.raises(EmitterAlreadyClosedError):
        em.emit_sync("d", 4)
    got = {r.key: r.value for r in em.read().collect()}
    assert got == {"a": 1, "b": 2}
