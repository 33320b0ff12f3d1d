"""Tester harness tests (mirrors tester/tester_test.go usage)."""

from pyspark.sql import functions as F

from goka_spark import AggFold, define_group, input_stream, output, persist
from goka_spark.testing import Tester


def _graph():
    return define_group(
        "counter",
        input_stream("clicks"),
        persist(AggFold({"cnt": F.count("*"), "total": F.sum("n")})),
        output("big", transform=lambda df: df.filter(F.col("n") > 5)
               .select("key", "n")),
    )


def test_consume_then_table_value(spark):
    t = Tester(spark, _graph())
    t.register_topic("clicks", "n long")
    t.consume("clicks", "alice", {"n": 1})
    t.consume("clicks", "alice", {"n": 2})
    t.consume("clicks", "bob", {"n": 7})
    assert t.table_value("alice") == {"cnt": 2, "total": 3}
    assert t.table_value("bob") == {"cnt": 1, "total": 7}
    assert t.table_value("carol") is None


def test_incremental_consume_recomputes(spark):
    t = Tester(spark, _graph())
    t.register_topic("clicks", "n long")
    t.consume("clicks", "a", {"n": 1})
    assert t.table_value("a")["cnt"] == 1
    t.consume("clicks", "a", {"n": 1})
    assert t.table_value("a")["cnt"] == 2  # replay picks up new message


def test_output_messages_tracked(spark):
    t = Tester(spark, _graph())
    t.register_topic("clicks", "n long")
    t.consume("clicks", "a", {"n": 3})
    t.consume("clicks", "b", {"n": 9})
    msgs = t.messages("big")
    assert [(m["key"], m["n"]) for m in msgs] == [("b", 9)]
