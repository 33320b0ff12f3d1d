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


def test_pyfold_batch_func_vectorized(spark):
    """batch_func: one vectorized call per key equals the row loop."""
    import numpy as np

    def row_fold(state, row):
        return state * 0.9 + row["value"]

    def vec_fold(pdf):
        v = pdf["value"].to_numpy()
        w = 0.9 ** np.arange(len(v) - 1, -1, -1)
        return float((v * w).sum())

    df = _events(spark)
    g1 = define_group("a", input_stream("t"), persist(PyFold(
        func=row_fold, init=0.0, state_schema="ewma double",
        finish=lambda s: {"ewma": round(s, 6)})))
    g2 = define_group("b", input_stream("t"), persist(PyFold(
        batch_func=vec_fold, state_schema="ewma double",
        finish=lambda s: {"ewma": round(s, 6)})))
    r1 = {r.key: r.ewma for r in Processor(g1).run({"t": df}).table.collect()}
    r2 = {r.key: r.ewma for r in Processor(g2).run({"t": df}).table.collect()}
    assert r1 == r2


def test_pyfold_requires_fold_fn(spark):
    import pytest as _pytest

    g = define_group("x", input_stream("t"), persist(PyFold(state_schema="v double")))
    with _pytest.raises(ValueError, match="func or batch_func"):
        Processor(g).run({"t": _events(spark)})


def test_join_lookup_with_column_on(spark):
    """`on=` accepting a Column expression (ADVICE r1: Column truthiness
    in enrich() raised CANNOT_CONVERT_COLUMN_INTO_BOOL)."""
    from goka_spark.graph import join, lookup

    events = _events(spark)
    # join table keyed by an expression over its own column
    jt = spark.createDataFrame([("U1", "gold"), ("U2", "basic")],
                               "uid string, tier string")
    lt = spark.createDataFrame([("u1", "DE"), ("u2", "US")],
                               "key string, country string")
    g = define_group(
        "g", input_stream("t"),
        join("tiers", on=F.lower("uid")),
        lookup("geo", on=F.col("key"), table_key="key"),
        persist(AggFold({"cnt": F.count("*"),
                         "tier": F.first("tier"),
                         "country": F.first("country")})),
    )
    rows = {r.key: (r.tier, r.country)
            for r in Processor(g).run({
                "t": events, "tiers": jt, "geo": lt}).table.collect()}
    assert rows == {"u1": ("gold", "DE"), "u2": ("basic", "US")}


def test_nil_handling_ignore_drops_tombstones(spark):
    """goka WithNilHandling(NilIgnore) (options.go:314): nil-valued
    messages never reach the callback/fold; default 'process' keeps
    them."""
    from pyspark.sql import functions as F

    from goka_spark import AggFold, Processor, define_group, input_stream, persist

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", None)], "key string, value double")
    g_ign = define_group("ni", input_stream("t", nil_handling="ignore"),
                         persist(AggFold({"cnt": F.count("*")})))
    got = {r.key: r.cnt for r in
           Processor(g_ign).run({"t": df}).table.collect()}
    assert got == {"a": 1}
    g_proc = define_group("np", input_stream("t"),
                          persist(AggFold({"cnt": F.count("*")})))
    got2 = {r.key: r.cnt for r in
            Processor(g_proc).run({"t": df}).table.collect()}
    assert got2 == {"a": 2, "b": 1}


def test_persist_update_callback_hook(spark):
    """goka WithUpdateCallback (options.go:173): the hook transforms
    table state between fold and storage."""
    from pyspark.sql import functions as F

    from goka_spark import AggFold, Processor, define_group, input_stream, persist

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0)], "key string, value double")
    g = define_group(
        "uc", input_stream("t"),
        persist(AggFold({"total": F.sum("value")}),
                update=lambda t: t.withColumn(
                    "total", F.least(F.col("total"), F.lit(5.0)))))
    got = {r.key: r.total for r in Processor(g).run({"t": df}).table.collect()}
    assert got == {"a": 3.0, "b": 5.0}  # b capped by the update hook


def test_group_graph_hook(spark):
    """WithGroupGraphHook (options.go:278): the hook sees (and may
    mutate) the graph before the processor compiles it."""
    from goka_spark import AggFold, Processor, define_group, input_stream, persist
    from goka_spark.graph import output
    from pyspark.sql import functions as F

    g = define_group("hooked", input_stream("t", key="k"),
                     persist(AggFold({"c": F.count("*")})))
    seen = []

    def hook(gg):
        seen.append(gg.group)
        gg.output_edges.append(output("audit"))

    Processor(g, graph_hook=hook)
    assert seen == ["hooked"]
    assert [e.topic for e in g.output_edges] == ["audit"]


def test_merge_headers_reference_semantics(spark):
    """Headers.Merged (headers.go:22): later keys override earlier,
    NULL/empty maps tolerated, all-empty merge yields NULL."""
    from goka_spark.headers import make_headers, merge_headers
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        make_headers(a=F.lit("1"), b=F.lit("x")).alias("h1"),
        make_headers(b=F.lit("y"), c=F.lit("3")).alias("h2"),
        F.lit(None).cast("map<string,binary>").alias("h3"))
    row = df.select(
        merge_headers("h1", "h2", "h3").alias("m"),
        merge_headers("h3", "h3").alias("empty")).collect()[0]
    assert {k: bytes(v) for k, v in row.m.items()} == \
        {"a": b"1", "b": b"y", "c": b"3"}
    assert row.empty is None


def test_merge_headers_matches_dict_merge_model(spark):
    """Model check: merge_headers over N generated cases equals
    Python's dict-merge (the reference semantics of Headers.Merged —
    later dicts override, empties skipped, all-empty → None)."""
    import random

    from pyspark.sql import functions as F

    from goka_spark.headers import merge_headers

    rng = random.Random(20260816)
    keys = ["a", "b", "c", "d", "e"]
    cases = []
    for i in range(60):
        maps = []
        for _ in range(3):
            if rng.random() < 0.25:
                maps.append(None)                 # NULL map
            else:
                maps.append({k: bytes([rng.randrange(256)])
                             for k in rng.sample(keys, rng.randrange(0, 4))})
        cases.append((i, *maps))
    df = spark.createDataFrame(
        cases, "i long, h1 map<string,binary>, h2 map<string,binary>, "
               "h3 map<string,binary>")
    got = {r.i: (None if r.m is None else
                 {k: bytes(v) for k, v in r.m.items()})
           for r in df.select("i", merge_headers("h1", "h2", "h3")
                              .alias("m")).collect()}
    for i, h1, h2, h3 in cases:
        want = {}
        for m in (h1, h2, h3):
            want.update(m or {})
        assert got[i] == (want or None), (i, h1, h2, h3)
