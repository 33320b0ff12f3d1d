"""GroupGraph DSL validation (mirrors graph_test.go)."""

import pytest

from goka_spark import AggFold, define_group, input_stream, loop, persist
from pyspark.sql import functions as F


def test_requires_input(spark):
    with pytest.raises(ValueError, match="input"):
        define_group("g", persist(AggFold({"c": F.count("*")})))


def test_single_persist(spark):
    with pytest.raises(ValueError, match="Persist"):
        define_group(
            "g",
            input_stream("t", key="k"),
            persist(AggFold({"c": F.count("*")})),
            persist(AggFold({"c": F.count("*")})),
        )


def test_single_loop(spark):
    with pytest.raises(ValueError, match="Loop"):
        define_group(
            "g",
            input_stream("t", key="k"),
            loop(lambda df: df),
            loop(lambda df: df),
        )


def test_topic_names(spark):
    g = define_group("grp", input_stream("t", key="k"),
                     persist(AggFold({"c": F.count("*")})))
    assert g.group_table == "grp-table"
    assert g.loop_stream == "grp-loop"
    assert g.persist_edge.topic == "grp-table"


def test_inputs_helper():
    from goka_spark import inputs

    g = define_group("grp", inputs(["a", "b"], key="k"))
    assert [e.topic for e in g.input_edges] == ["a", "b"]


def test_suffix_config_reference_semantics(spark):
    """SetTableSuffix/SetLoopSuffix/ResetSuffixes (graph.go:19/25/31):
    the suffix current at DefineGroup time names the topics; changing
    it later does NOT rename an already-defined graph (the reference
    evaluates tableName/loopName inside DefineGroup), and
    reset_suffixes restores the defaults."""
    from goka_spark.graph import (group_table, loop_stream,
                                  reset_suffixes, set_loop_suffix,
                                  set_table_suffix)
    try:
        set_table_suffix(".state")
        set_loop_suffix(".rekey")
        assert group_table("grp") == "grp.state"
        assert loop_stream("grp") == "grp.rekey"
        g = define_group("grp", input_stream("t", key="k"),
                         persist(AggFold({"c": F.count("*")})),
                         loop(lambda df: df))
        assert g.group_table == "grp.state"
        assert g.persist_edge.topic == "grp.state"
        assert g.loop_edge.topic == "grp.rekey"
        # a later suffix change leaves the defined graph untouched
        set_table_suffix("-other")
        assert g.group_table == "grp.state"
    finally:
        reset_suffixes()
    assert group_table("grp") == "grp-table"
    g2 = define_group("grp", input_stream("t", key="k"),
                      persist(AggFold({"c": F.count("*")})))
    assert g2.group_table == "grp-table"
