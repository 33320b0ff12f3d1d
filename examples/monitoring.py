"""Mirror of goka examples/8-monitoring: run processors, attach them
and their views to the built-in monitor/query web server, and hit the
endpoints (the reference attaches goka's monitor.Server and
query.Server to an HTTP mux — examples/8-monitoring/main.go).

Run: python examples/monitoring.py
"""

import json
import sys
import tempfile
from urllib.request import urlopen

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import (AggFold, Emitter, MonitorServer, Processor,
                        StringCodec, View, define_group, get_session,
                        input_stream, persist)

spark = get_session("example-monitoring")

topic_path = tempfile.mkdtemp() + "/user-clicks"
emitter = Emitter(spark, topic_path, codec=StringCodec())
for user, page in [("alice", "home"), ("bob", "search"),
                   ("alice", "cart"), ("alice", "checkout")]:
    emitter.emit(user, page)
emitter.finish()

g = define_group(
    "mini-group",
    input_stream("user-clicks"),
    persist(AggFold({"clicks": F.count("*")})),
)
result = Processor(g).run(
    {"user-clicks": emitter.read().withColumn("ts", F.current_timestamp())})

srv = MonitorServer().start()
srv.attach_processor("mini-group", result)
srv.attach_view("mini-group-table", View(result.table))
print("monitor listening on", srv.address)

index = json.load(urlopen(srv.address + "/"))
print("index:", index)
stats = json.load(urlopen(srv.address + "/data/processor/mini-group"))
print("processor stats:", stats)
alice = json.load(urlopen(srv.address + "/query/mini-group-table/alice"))
print("key query alice:", alice)
assert alice["value"] == {"clicks": 3}

srv.stop()
print("OK")
