"""Processor unit tests on tiny in-memory topics (mirrors
processor_test.go / tester-package style: feed messages, assert table)."""

from pyspark.sql import functions as F

from goka_spark import (
    AggFold,
    Processor,
    PyFold,
    ReduceFold,
    define_group,
    input_stream,
    output,
    persist,
)


def _events(spark):
    rows = [
        ("u1", 1, 10.0, "click"),
        ("u1", 2, 5.0, "buy"),
        ("u2", 3, 7.0, "click"),
        ("u1", 4, 1.0, "click"),
    ]
    return spark.createDataFrame(rows, "key string, ts long, value double, typ string")


def test_agg_fold(spark):
    g = define_group("g", input_stream("t"), persist(AggFold({
        "cnt": F.count("*"), "total": F.sum("value")})))
    got = {r.key: (r.cnt, r.total) for r in
           Processor(g).run({"t": _events(spark)}).table.collect()}
    assert got == {"u1": (3, 16.0), "u2": (1, 7.0)}


def test_reduce_fold_last_wins(spark):
    g = define_group("g", input_stream("t"), persist(ReduceFold({
        "last_typ": F.col("typ"), "last_val": F.col("value")})))
    got = {r.key: (r.last_typ, r.last_val) for r in
           Processor(g).run({"t": _events(spark)}).table.collect()}
    assert got == {"u1": ("click", 1.0), "u2": ("click", 7.0)}


def test_pyfold_ordered(spark):
    def cb(state, row):  # concat types in ts order — order-sensitive
        return state + [row["typ"]]

    g = define_group("g", input_stream("t"), persist(PyFold(
        func=cb, init=list, state_schema="seq string",
        finish=lambda s: {"seq": ">".join(s)})))
    got = {r.key: r.seq for r in
           Processor(g).run({"t": _events(spark)}).table.collect()}
    assert got == {"u1": "click>buy>click", "u2": "click"}


def test_output_edge(spark):
    g = define_group(
        "g",
        input_stream("t", where=F.col("typ") == "click"),
        output("clicks", transform=lambda df: df.select("key", "value")),
    )
    r = Processor(g).run({"t": _events(spark)})
    assert r.outputs["clicks"].count() == 3
    assert r.table is None


def test_key_expression(spark):
    df = _events(spark).withColumnRenamed("key", "user")
    g = define_group("g", input_stream("t", key=F.upper("user")),
                     persist(AggFold({"cnt": F.count("*")})))
    got = {r.key for r in Processor(g).run({"t": df}).table.collect()}
    assert got == {"U1", "U2"}
