"""Mirror of goka examples/5-multiple (main.go:136-139): ONE
processor callback over SEVERAL input topics, persisting one state,
plus a View over the group table (main.go:169).

Run: python examples/multiple.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import (AggFold, Emitter, Processor, StringCodec, View,
                        define_group, get_session, input_stream, persist)

spark = get_session("example-multiple")

base = tempfile.mkdtemp()
a_path, b_path = base + "/input-A", base + "/input-B"

# two producers, two topics (5-multiple's inputA/inputB emitters)
for path, vals in [(a_path, [("alice", "a1"), ("bob", "a2")]),
                   (b_path, [("alice", "b1"), ("carol", "b2")])]:
    em = Emitter(spark, path, codec=StringCodec())
    for k, v in vals:
        em.emit_sync(k, v)

read = lambda p: (Emitter(spark, p, codec=StringCodec()).read()
                  .withColumn("ts", F.current_timestamp()))

# goka.DefineGroup(group, Input(inputA,...), Input(inputB,...), Persist)
g = define_group(
    "multiInput",
    input_stream("input-A"),
    input_stream("input-B"),
    persist(AggFold({"seen": F.count("*")})),
)
table = Processor(g).run({"input-A": read(a_path),
                          "input-B": read(b_path)}).table

# goka.NewView(GroupTable(group)) — main.go:169
view = View(table)
got = {k: view.get(k)["seen"] for k in ["alice", "bob", "carol"]}
print("group table:", got)
assert got == {"alice": 2, "bob": 1, "carol": 1}
print("OK")
