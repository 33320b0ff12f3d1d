"""View lifecycle observation — the Spark face of goka's
View.CurrentState / ObserveStateChanges / Recovered / WaitRunning
(reference view.go:449, :475, :431, :104).

A goka app typically does::

    view := goka.NewView(...)
    go view.Run(ctx)
    <-view.WaitRunning()          // block until caught up
    // poll view.CurrentState() from a health check

The Spark analog: attach a ``ViewStateTracker`` to the session before
starting the table query; it maps StreamingQueryListener events onto
the same five-state machine and exposes the same polling/observer
surfaces (plus an HTTP endpoint via MonitorServer).

Run: python examples/view_lifecycle.py
"""

import datetime as dt
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import AggFold, define_group, get_session, input_stream, persist
from goka_spark.streaming.runtime import (
    StreamingProcessor,
    ViewStateTracker,
    stream_from_dir,
    view_state_name,
)
from goka_spark.web import MonitorServer

spark = get_session("example-view-lifecycle")
base = tempfile.mkdtemp()
src = f"{base}/clicks"
SCHEMA = "key string, ts timestamp, value double"

rows = [("alice", dt.datetime(2024, 1, 1, 0, i), float(i)) for i in range(5)]
spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)

# 1. attach the tracker BEFORE the query starts (like go view.Run)
tracker = ViewStateTracker("clicks_table").attach(spark)
obs = tracker.observe_state_changes()

# 2. surface it on the monitor (GET /data/view-state/clicks)
web = MonitorServer().start()
web.attach_view_state("clicks", tracker)

g = define_group("clicks", input_stream("t"),
                 persist(AggFold({"cnt": F.count("*")})))
q = StreamingProcessor(g).start_table(
    {"t": stream_from_dir(spark, src, SCHEMA)},
    queryName="clicks_table", checkpoint=f"{base}/ckpt")

# 3. WaitRunning: block until the backlog is replayed
q.processAllAvailable()
assert tracker.wait_running(timeout=60)
print("recovered:", tracker.recovered())
print("current  :", view_state_name(tracker.current_state()))

# 4. the observer channel saw every transition, in order
transitions = []
while not obs.C.empty():
    transitions.append(view_state_name(obs.C.get()))
print("observed :", " -> ".join(transitions))

print("http     :", f"{web.address}/data/view-state/clicks")

obs.stop()
q.stop()
web.stop()
spark.stop()
