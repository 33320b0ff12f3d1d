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
    import urllib.request
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
        assert idx == {"processors": ["mon"], "sources": ["mon-table"],
                       "views": ["mon-table"]}

        # a browser (Accept: text/html) gets the HTML index at / —
        # the reference's monitor root renders index.go.html
        req = urllib.request.Request(
            srv.address + "/", headers={"Accept": "text/html"})
        with urlopen(req) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            root_page = resp.read().decode()
        assert "mon" in root_page and "mon-table" in root_page
        assert "<h2>Views</h2>" in root_page

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


def test_monitor_server_actions(spark):
    """r7: the reference's actions surface (web/actions/server.go:
    47-48) — POST start/stop with run-state tracking, the built-in
    drop-view actor, and error capture."""
    import json
    import threading
    import time
    import urllib.request
    from urllib.error import HTTPError

    from goka_spark.web import MonitorServer

    srv = MonitorServer().start()
    try:
        def post(path, data=b""):
            req = urllib.request.Request(srv.address + path, data=data,
                                         method="POST")
            with urllib.request.urlopen(req) as resp:
                return json.load(resp)

        # attach a long-running cooperative actor
        seen = {}

        def actor(value, stop):
            seen["value"] = value
            stop.wait(timeout=30)
            seen["stopped"] = True

        srv.attach_action("reprocess", actor, "test actor")
        idx = json.load(urllib.request.urlopen(srv.address + "/actions"))
        assert idx["reprocess"]["description"] == "test actor"
        assert not idx["reprocess"]["running"]

        assert post("/actions/start/reprocess", b"topic-a")["ok"]
        time.sleep(0.2)
        idx = json.load(urllib.request.urlopen(srv.address + "/actions"))
        assert idx["reprocess"]["running"] and seen["value"] == "topic-a"
        # double-start rejected while running (server.go:62)
        try:
            post("/actions/start/reprocess", b"again")
            raise AssertionError("double start must 409")
        except HTTPError as e:
            assert e.code == 409
        assert post("/actions/stop/reprocess")["ok"]
        assert seen.get("stopped")
        idx = json.load(urllib.request.urlopen(srv.address + "/actions"))
        assert not idx["reprocess"]["running"]
        assert idx["reprocess"]["finished"] >= idx["reprocess"]["started"]

        # stop while not running → 409 (server.go:78)
        try:
            post("/actions/stop/reprocess")
            raise AssertionError("stop-idle must 409")
        except HTTPError as e:
            assert e.code == 409

        # failing actor: error captured, never raised at the server
        def boom(value, stop):
            raise RuntimeError("kaboom")

        srv.attach_action("bad", boom)
        assert post("/actions/start/bad")["ok"]
        time.sleep(0.2)
        idx = json.load(urllib.request.urlopen(srv.address + "/actions"))
        assert "kaboom" in idx["bad"]["error"]

        # built-in drop-view detaches a query source
        srv.attach_source("v1", lambda k: {"k": k})
        got = json.load(urllib.request.urlopen(srv.address + "/query/v1/x"))
        assert got["value"] == {"k": "x"}
        assert post("/actions/start/drop-view", b"v1")["ok"]
        time.sleep(0.2)
        try:
            urllib.request.urlopen(srv.address + "/query/v1/x")
            raise AssertionError("dropped view must 404")
        except HTTPError as e:
            assert e.code == 404
        # unknown action name
        try:
            post("/actions/start/nope")
            raise AssertionError("unknown action must 404")
        except HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_monitor_server_streaming_control(spark, tmp_path):
    """Pause/resume a real Structured Streaming query through the
    actions surface: start launches from checkpoint, stop halts it;
    a second start resumes and picks up new input."""
    import json
    import time
    import urllib.request

    from pyspark.sql import functions as F

    from goka_spark.streaming.runtime import stream_from_dir
    from goka_spark.web import MonitorServer

    schema = "key string, value long"
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([("a", 1), ("b", 2)], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    def start_query():
        return (stream_from_dir(spark, src, schema)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="200 milliseconds")
                .start())

    srv = MonitorServer().start()
    try:
        srv.attach_streaming_control("ingest", start_query)

        def post(path):
            req = urllib.request.Request(srv.address + path, data=b"",
                                         method="POST")
            with urllib.request.urlopen(req) as resp:
                return json.load(resp)

        assert post("/actions/start/ingest")["ok"]
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        assert spark.read.parquet(out).count() >= 2
        assert post("/actions/stop/ingest")["ok"]  # pause

        # new data lands while paused; resume picks it up from ckpt
        spark.createDataFrame([("c", 3)], schema).coalesce(1) \
            .write.mode("append").parquet(src)
        assert post("/actions/start/ingest")["ok"]
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 3:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        assert spark.read.parquet(out).count() >= 3
        assert post("/actions/stop/ingest")["ok"]
    finally:
        srv.stop()


def test_monitor_server_query_and_actions_pages(spark):
    """r11: the full server-rendered UI the reference ships as
    web/templates/{query,actions,monitor}/ — key-search form with a
    value panel (query/index.go.html), the actions table whose forms
    post urlencoded value= and navigate back (actions/index.go.html
    over server.go:47's endpoints), and the view-lifecycle page."""
    import json as _json
    import time
    import urllib.request
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from goka_spark import View
    from goka_spark.web import MonitorServer

    ev = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
        "key string, ts long, value double")
    g = define_group("mon3", input_stream("t"),
                     persist(AggFold({"cnt": F.count("*")})))
    r = Processor(g).run({"t": ev})

    srv = MonitorServer().start()
    try:
        srv.attach_view("mon3-table", View(r.table))

        # query landing page: source links + the form
        page = urlopen(srv.address + "/ui/query").read().decode()
        assert "mon3-table" in page and "<form" in page

        # form submit = GET ?key=... → value panel (pretty JSON)
        page = urlopen(
            srv.address + "/ui/query/mon3-table?key=a").read().decode()
        assert "<pre>" in page and "&quot;cnt&quot;: 2" in page
        # path-style key (the /query/{key:.*} convention) renders too
        page = urlopen(
            srv.address + "/ui/query/mon3-table/b").read().decode()
        assert "&quot;cnt&quot;: 1" in page
        # missing key: explicit panel, not a 500
        page = urlopen(
            srv.address + "/ui/query/mon3-table?key=zz").read().decode()
        assert "key not found" in page
        try:
            urlopen(srv.address + "/ui/query/nope")
            raise AssertionError("unknown source must 404")
        except HTTPError as e:
            assert e.code == 404

        # actions page: the built-in drop-view actor renders with a
        # start form; posting the form (urlencoded value= plus the
        # embedded per-process CSRF token) runs it and 303s back
        page = urlopen(srv.address + "/ui/actions").read().decode()
        assert "drop-view" in page and "name='value'" in page
        import re as _re

        tok = _re.search(r"name='_csrf' value='([0-9a-f]+)'", page).group(1)
        # a cross-site form (no token) must be refused, not executed
        req = urllib.request.Request(
            srv.address + "/ui/actions/start/drop-view",
            data=b"value=mon3-table",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST")
        try:
            urlopen(req)
            raise AssertionError("tokenless form POST must 403")
        except HTTPError as e:
            assert e.code == 403
        idx = _json.load(urlopen(srv.address + "/"))
        assert "mon3-table" in idx["sources"]  # NOT detached
        req = urllib.request.Request(
            srv.address + "/ui/actions/start/drop-view",
            data=f"value=mon3-table&_csrf={tok}".encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST")
        with urlopen(req) as resp:   # urllib follows the 303 to /ui
            assert resp.status == 200
            assert "Action" in resp.read().decode()
        time.sleep(0.3)
        # the actor consumed the FORM-DECODED value: source detached
        idx = _json.load(urlopen(srv.address + "/"))
        assert "mon3-table" not in idx["sources"]
        # API clients still get the raw-body JSON contract
        req = urllib.request.Request(
            srv.address + "/actions/stop/drop-view", method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("stop-idle must stay a JSON 409")
        except HTTPError as e:
            assert e.code == 409
            assert _json.load(e)["error"] == "action is not running"
    finally:
        srv.stop()


def test_monitor_server_view_state_page():
    """r11: /ui/view-state/<name> renders the lifecycle dict
    (details_view.go.html analog) the JSON endpoint serves."""
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from goka_spark.web import MonitorServer

    class FakeTracker:
        def state_dict(self):
            return {"state": "Running", "state_id": 4, "recovered": True}

    srv = MonitorServer().start()
    try:
        srv.attach_view_state("lifeview", FakeTracker())
        idx = urlopen(srv.address + "/ui").read().decode()
        assert "/ui/view-state/lifeview" in idx
        page = urlopen(srv.address + "/ui/view-state/lifeview") \
            .read().decode()
        assert "Running" in page and "recovered" in page
        try:
            urlopen(srv.address + "/ui/view-state/nope")
            raise AssertionError("unknown view must 404")
        except HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_raw_actions_csrf_gate():
    """r13 (ADVICE): the raw POST /actions/{start,stop}/<name> routes
    must not be forgeable by a cross-site HTML form.  Every modern
    browser attaches an unforgeable Origin header to cross-origin
    POSTs (forms included), so the gate is the OWASP standard-headers
    check: foreign Origin (or, legacy, foreign Referer) → 403;
    X-CSRF-Token always proves a request; header-free non-browser
    clients (curl -d / urllib defaults) keep the untouched raw-body
    contract."""
    import json
    import urllib.request
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from goka_spark.web import MonitorServer

    srv = MonitorServer().start()
    try:
        ran = []

        def actor(value, stop):
            ran.append(value)

        srv.attach_action("touch", actor, "csrf probe")

        def post(path, data=b"", headers=None, expect=200):
            req = urllib.request.Request(
                srv.address + path, data=data,
                headers=headers or {}, method="POST")
            try:
                with urlopen(req) as resp:
                    assert resp.status == expect
                    return json.load(resp)
            except HTTPError as e:
                assert e.code == expect, (e.code, expect, e.read())
                return json.load(e)

        # 1. a cross-site form submission: browsers ALWAYS attach the
        #    attacker-site Origin on a cross-origin POST → 403, and
        #    the actor never runs
        body = post("/actions/start/touch", b"v1",
                    {"Content-Type": "application/x-www-form-urlencoded",
                     "Origin": "http://evil.example"}, expect=403)
        assert "CSRF" in body["error"]
        # a no-cors fetch (text/plain) carries Origin too → 403
        post("/actions/start/touch", b"v1",
             {"Content-Type": "text/plain",
              "Origin": "http://evil.example"}, expect=403)
        # Origin: null (sandboxed-iframe form) is foreign, not ours
        post("/actions/start/touch", b"v1", {"Origin": "null"},
             expect=403)
        # legacy browser: no Origin but a foreign Referer → 403
        post("/actions/start/touch", b"v1",
             {"Referer": "http://evil.example/trap.html"}, expect=403)
        assert ran == []

        # 2. header-free non-browser client: unchanged raw contract —
        #    urllib (like curl -d) defaults to the form content-type,
        #    which must NOT be gated on its own
        out = post("/actions/start/touch", b"plain-client")
        assert out["ok"] is True
        import time
        time.sleep(0.2)
        assert ran == ["plain-client"]

        # 3. a request that PROVES itself with the token header is
        #    accepted even with a foreign Origin (same-origin JS
        #    clients behind a proxy, test harnesses)
        page = urlopen(srv.address + "/ui/actions").read().decode()
        import re
        tok = re.search(r"name='_csrf' value='([0-9a-f]+)'", page).group(1)
        out = post("/actions/start/touch", b"tokened",
                   {"Content-Type": "text/plain", "X-CSRF-Token": tok,
                    "Origin": "http://evil.example"})
        assert out["ok"] is True
        time.sleep(0.2)
        assert ran == ["plain-client", "tokened"]

        # 4. a same-origin Origin (modern same-site JS POST) passes
        import urllib.parse as _up
        host = _up.urlparse(srv.address).netloc
        out = post("/actions/start/touch", b"sameorigin",
                   {"Origin": f"http://{host}"})
        assert out["ok"] is True
        time.sleep(0.2)
        assert ran == ["plain-client", "tokened", "sameorigin"]
    finally:
        srv.stop()
