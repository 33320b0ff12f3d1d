"""GroupGraph DSL validation (mirrors graph_test.go)."""

import pytest

from goka_spark import AggFold, define_group, input_stream, loop, persist
from pyspark.sql import functions as F


def test_requires_input():
    with pytest.raises(ValueError, match="input"):
        define_group("g", persist(AggFold({"c": F.count("*")})))


def test_single_persist():
    with pytest.raises(ValueError, match="Persist"):
        define_group(
            "g",
            input_stream("t", key="k"),
            persist(AggFold({"c": F.count("*")})),
            persist(AggFold({"c": F.count("*")})),
        )


def test_single_loop():
    with pytest.raises(ValueError, match="Loop"):
        define_group(
            "g",
            input_stream("t", key="k"),
            loop(lambda df: df),
            loop(lambda df: df),
        )


def test_topic_names():
    g = define_group("grp", input_stream("t", key="k"),
                     persist(AggFold({"c": F.count("*")})))
    assert g.group_table == "grp-table"
    assert g.loop_stream == "grp-loop"
    assert g.persist_edge.topic == "grp-table"


def test_inputs_helper():
    from goka_spark import inputs

    g = define_group("grp", inputs(["a", "b"], key="k"))
    assert [e.topic for e in g.input_edges] == ["a", "b"]
