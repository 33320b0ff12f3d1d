"""Consumer-group membership over the wire — the transport half of a
goka processor's rebalance loop (reference processor.go Run,
copartition_strategy.go:51 CopartitioningStrategy).

Two "processor instances" join the same group on two copartitioned
topics; the group coordinator splits the partitions 2/2 with the SAME
range on both topics (goka's copartition invariant — the property
that keeps stream-table joins shuffle-free), each instance consumes
its slice and commits generation-fenced offsets, one instance leaves,
and the survivor rebalances back to everything and resumes from the
committed offsets.

Run: python examples/consumer_group.py
"""

import sys
import threading

sys.path.insert(0, ".")

from goka_spark.kafka_wire import (
    FakeBroker,
    WireConsumer,
    WireGroupMember,
    WireProducer,
    WireTopicManager,
)

broker = FakeBroker().start()
tm = WireTopicManager([broker.address])
tm.ensure_stream_exists("clicks", 4)
tm.ensure_stream_exists("orders", 4)

prod = WireProducer([broker.address])
for i in range(12):
    prod.emit("clicks", f"user-{i}", f"c{i}".encode())
    prod.emit("orders", f"user-{i}", f"o{i}".encode())

m1 = WireGroupMember([broker.address], "pipeline", ["clicks", "orders"])
m2 = WireGroupMember([broker.address], "pipeline", ["clicks", "orders"])

print("m1 alone:", m1.join())

t = threading.Thread(target=m2.join)  # blocks until the leader replans
t.start()
while m1.heartbeat():                 # coordinator says: rebalance
    pass
a1 = m1.join()
t.join()
print("after m2 joins:")
print("  m1:", a1)
print("  m2:", m2.assignment)

cons = WireConsumer([broker.address])
consumed = 0
for member in (m1, m2):
    for topic, parts in member.assignment.items():
        for pid in parts:
            recs = cons.fetch(topic, pid, 0)
            consumed += len(recs)
            if recs:
                member.commit_offsets({(topic, pid): recs[-1].offset + 1})
print("consumed across both members:", consumed)

m2.leave()
while m1.heartbeat():
    pass
print("m1 after m2 leaves:", m1.join())
resume = m1.fetch_offsets("clicks", [0, 1, 2, 3])
print("committed offsets survive the rebalance:", resume)

for c in (m1, m2):
    c.close()
cons.close()
prod.close()
tm.close()
broker.stop()
