"""View semantics (mirrors view_test.go Get/Has/Iterator/Range)."""

from goka_spark import View


def _table(spark):
    return spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "key string, cnt long"
    )


def test_get_has(spark):
    v = View(_table(spark))
    assert v.get("b") == {"cnt": 2}
    assert v.get("zz") is None
    assert v.has("a")
    assert not v.has("zz")


def test_iterator_sorted(spark):
    v = View(_table(spark))
    assert [k for k, _ in v.iterator()] == ["a", "b", "c", "d"]


def test_iterator_range(spark):
    v = View(_table(spark))
    got = list(v.iterator_range("b", "d"))
    assert got == [("b", {"cnt": 2}), ("c", {"cnt": 3})]


def test_evict(spark):
    v = View(_table(spark)).evict("a")
    assert not v.has("a")
    assert v.has("b")


def test_seek(spark):
    """Iterator.Seek (view_test.go / storage/iterator.go:43): first
    key >= seek, then forward scan to the end."""
    v = View(_table(spark))
    assert list(v.seek("b")) == [
        ("b", {"cnt": 2}), ("c", {"cnt": 3}), ("d", {"cnt": 4})]
    # seek between keys lands on the next one
    assert [k for k, _ in v.seek("bb")] == ["c", "d"]
    # seek past the end is an empty cursor
    assert list(v.seek("zz")) == []
