"""HTTP monitoring + key-query façade — goka's web/ surface.

Mirrors the reference's built-in monitor and query servers
(web/monitor/monitoring.go:33-69 NewServer/AttachProcessor/AttachView,
web/query/query.go:56-113 AttachSource + ``/{name}/{key}`` lookup,
examples/8-monitoring) as JSON-over-HTTP on the stdlib http.server —
no web framework dependency, runs in-process next to the driver.

Endpoints:
- ``GET /``                      index: attached processors + sources
- ``GET /data/processor/{name}`` processor stats (stats.py)
- ``GET /query/{name}/{key}``    point lookup through a View getter
- ``GET /ui`` / ``GET /ui/processor/{name}``  human-facing HTML pages
  rendered server-side from the same data (the reference renders
  web/templates/*.go.html from monitoring.go:33; here it is a plain
  stdlib render of the identical stats dict — no framework, no JS)

Scale note: stats are computed by ONE Spark aggregation per request on
the already-materialized result DataFrames; point queries go through
``View.get`` (a pushed-down key filter).  For serving at high QPS the
table belongs in a key-partitioned store — this server is the
monitoring/debug surface, same as goka's.
"""

from __future__ import annotations

import html as _html_mod
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable
from urllib.parse import unquote, urlparse

from goka_spark.operators.processor import ProcessorResult
from goka_spark.operators.view import View
from goka_spark.stats import processor_stats


class MonitorServer:
    """In-process monitor/query server (web/monitor + web/query)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._processors: dict[str, ProcessorResult] = {}
        self._sources: dict[str, Callable[[Any], Any]] = {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet under pytest
                pass

            def _json(self, obj: Any, code: int = 200) -> None:
                body = json.dumps(obj, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _page(self, title: str, body_html: str,
                      code: int = 200) -> None:
                body = (
                    "<!doctype html><html><head><meta charset='utf-8'>"
                    f"<title>{_html_mod.escape(title)}</title>"
                    "<style>body{font-family:sans-serif;margin:2em}"
                    "table{border-collapse:collapse}"
                    "td,th{border:1px solid #999;padding:4px 10px;"
                    "text-align:left}</style></head><body>"
                    f"<h1>{_html_mod.escape(title)}</h1>{body_html}"
                    "</body></html>").encode()
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _ui(self, parts: list[str]) -> None:
                esc = _html_mod.escape
                if len(parts) == 1:  # /ui — index page
                    procs = "".join(
                        f"<li><a href='/ui/processor/{esc(n)}'>{esc(n)}"
                        "</a></li>" for n in sorted(outer._processors))
                    srcs = "".join(
                        f"<li>{esc(n)} — query at /query/{esc(n)}/&lt;key&gt;"
                        "</li>" for n in sorted(outer._sources))
                    self._page(
                        "goka_spark monitor",
                        f"<h2>Processors</h2><ul>{procs or '<li>none</li>'}"
                        f"</ul><h2>Query sources</h2>"
                        f"<ul>{srcs or '<li>none</li>'}</ul>")
                elif parts[1] == "processor" and len(parts) == 3:
                    res = outer._processors.get(parts[2])
                    if res is None:
                        self._page("unknown processor",
                                   "<p>not attached</p>", 404)
                        return
                    rows = "".join(
                        f"<tr><td>{esc(str(k))}</td>"
                        f"<td>{esc(str(v))}</td></tr>"
                        for k, v in processor_stats(res).items())
                    self._page(
                        f"processor {parts[2]}",
                        "<p><a href='/ui'>&larr; index</a></p>"
                        f"<table><tr><th>stat</th><th>value</th></tr>"
                        f"{rows}</table>")
                else:
                    self._page("not found", "<p>no such page</p>", 404)

            def do_GET(self) -> None:
                path = urlparse(self.path).path
                parts = [unquote(p) for p in path.split("/") if p]
                try:
                    if not parts:
                        self._json({
                            "processors": sorted(outer._processors),
                            "sources": sorted(outer._sources),
                        })
                    elif parts[:2] == ["data", "processor"] and len(parts) == 3:
                        res = outer._processors.get(parts[2])
                        if res is None:
                            self._json({"error": "unknown processor"}, 404)
                        else:
                            self._json(processor_stats(res))
                    elif parts[0] == "ui":
                        self._ui(parts)
                    elif parts[0] == "query" and len(parts) >= 3:
                        getter = outer._sources.get(parts[1])
                        if getter is None:
                            self._json({"error": "unknown source"}, 404)
                        else:
                            key = "/".join(parts[2:])  # {key:.*} in goka
                            val = getter(key)
                            if val is None:
                                self._json({"error": "key not found"}, 404)
                            else:
                                self._json({"key": key, "value": val})
                    else:
                        self._json({"error": "not found"}, 404)
                except Exception as e:  # surface, don't kill the server
                    self._json({"error": repr(e)}, 500)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- attachment (monitoring.go:62 AttachProcessor / query.go:103
    #    AttachSource) --------------------------------------------------
    def attach_processor(self, name: str, result: ProcessorResult) -> None:
        self._processors[name] = result

    def attach_view(self, name: str, view: View) -> None:
        """A View is both a monitorable source and a query getter."""
        self._sources[name] = view.get

    def attach_source(self, name: str, getter: Callable[[Any], Any]) -> None:
        self._sources[name] = getter

    # -- lifecycle ------------------------------------------------------
    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "MonitorServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
