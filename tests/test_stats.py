"""Stats surface (stats.go analog)."""

from pyspark.sql import functions as F

from goka_spark import AggFold, Processor, define_group, input_stream, output, persist
from goka_spark.stats import processor_stats, table_stats


def test_processor_stats(spark):
    ev = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
        "key string, ts long, value double")
    g = define_group(
        "s", input_stream("t"),
        persist(AggFold({"cnt": F.count("*")})),
        output("o", transform=lambda df: df.filter(F.col("value") > 1.5)),
    )
    r = Processor(g).run({"t": ev})
    st = processor_stats(r)
    assert st["group"] == "s"
    assert st["input_counts"] == {"t": 3}
    assert st["output_counts"] == {"o": 2}
    assert st["table"]["keys"] == 2
    assert st["table"]["unique_key_invariant"]


def test_table_stats_empty_graph(spark):
    ev = spark.createDataFrame([("a", 1)], "key string, ts long")
    g = define_group("s2", input_stream("t"),
                     output("o", transform=lambda df: df))
    r = Processor(g).run({"t": ev})
    assert table_stats(r) == {"keys": 0, "partitions": 0}


def test_monitor_server_endpoints(spark):
    """web/monitor + web/query parity: index, processor stats, and
    point key lookup over HTTP (examples/8-monitoring)."""
    import json
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from goka_spark import View
    from goka_spark.web import MonitorServer

    ev = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
        "key string, ts long, value double")
    g = define_group("mon", input_stream("t"),
                     persist(AggFold({"cnt": F.count("*")})))
    r = Processor(g).run({"t": ev})

    srv = MonitorServer().start()
    try:
        srv.attach_processor("mon", r)
        srv.attach_view("mon-table", View(r.table))

        idx = json.load(urlopen(srv.address + "/"))
        assert idx == {"processors": ["mon"], "sources": ["mon-table"]}

        st = json.load(urlopen(srv.address + "/data/processor/mon"))
        assert st["group"] == "mon" and st["table"]["keys"] == 2

        got = json.load(urlopen(srv.address + "/query/mon-table/a"))
        assert got == {"key": "a", "value": {"cnt": 2}}

        for bad in ("/query/mon-table/zz", "/query/nope/a", "/data/processor/x"):
            try:
                urlopen(srv.address + bad)
                assert False, f"expected 404 for {bad}"
            except HTTPError as e:
                assert e.code == 404
    finally:
        srv.stop()


def test_monitor_server_html_ui(spark):
    """The /ui pages render the same data as the JSON endpoints as
    server-side HTML (reference web/templates parity) — names on the
    index, stats table per processor, 404 page for unknowns."""
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from goka_spark import View
    from goka_spark.web import MonitorServer

    ev = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0)], "key string, ts long, value double")
    g = define_group("mon2", input_stream("t"),
                     persist(AggFold({"cnt": F.count("*")})))
    r = Processor(g).run({"t": ev})

    srv = MonitorServer().start()
    try:
        srv.attach_processor("mon2", r)
        srv.attach_view("mon2-table", View(r.table))

        with urlopen(srv.address + "/ui") as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        assert "mon2" in page and "/ui/processor/mon2" in page
        assert "mon2-table" in page

        detail = urlopen(srv.address + "/ui/processor/mon2").read().decode()
        assert "<table>" in detail and "group" in detail and "mon2" in detail

        try:
            urlopen(srv.address + "/ui/processor/nope")
            assert False, "expected 404"
        except HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
