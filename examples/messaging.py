"""Mirror of goka examples/3-messaging: a messaging service composed
from emitters, processors with joins/lookups/loopback, and views.

Components (one GroupGraph each, like the Go original):
- collector: latest-5 messages per user      (Value/SetValue list state)
- blocker:   block/unblock users             (table keyed by user)
- filter:    drop messages from blocked send (Join against blocker table)
- translator: word substitution               (Lookup table)
- detector:  auto-block spammy senders        (Loopback re-key)

Run: python examples/messaging.py
"""

import datetime as dt
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from goka_spark import (AggFold, Processor, View, define_group, get_session,
                        input_stream, join, lookup, loop, output, persist)
from goka_spark.operators.folds import latest_n_list

spark = get_session("example-messaging")

T0 = dt.datetime(2024, 1, 1)
msg = lambda i, frm, to, content: (to, T0 + dt.timedelta(seconds=i), frm, content)
received = spark.createDataFrame(
    [
        msg(1, "bob", "alice", "hey how are you"),
        msg(2, "alice", "bob", "good thanks"),
        msg(3, "spammer", "alice", "buy cheap stuff"),
        msg(4, "spammer", "bob", "buy cheap stuff"),
        msg(5, "spammer", "carol", "buy cheap stuff"),
        msg(6, "bob", "alice", "lunch later?"),
    ],
    "key string, ts timestamp, sender string, content string",
)

# --- blocker table (3-messaging/blocker): spammer is blocked ---
block_events = spark.createDataFrame(
    [("spammer", T0, True)], "key string, ts timestamp, blocked boolean")
blocker = define_group(
    "blocker", input_stream("block-events"),
    persist(AggFold({"blocked": F.max_by("blocked", F.col("ts"))})),
)
blocker_table = Processor(blocker).run({"block-events": block_events}).table

# --- translator lookup table (3-messaging/translator) ---
translations = spark.createDataFrame(
    [("cheap", T0, "affordable")], "key string, ts timestamp, translated string")
translator = define_group(
    "translator", input_stream("translate-events"),
    persist(AggFold({"translated": F.max_by("translated", F.col("ts"))})),
)
word_table = Processor(translator).run({"translate-events": translations}).table

# --- filter processor: drop blocked senders, translate, forward ---
# (3-messaging/filter: Join on blocker table keyed by sender + word lookup)
filt = define_group(
    "message_filter",
    # note: goka's filter joins the blocker table on the SENDER —
    # re-key by sender for the join, then emit keyed by recipient
    input_stream("received", key="sender"),
    join("blocker-table"),
    output("valid", transform=lambda df: (
        df.filter(~F.coalesce(F.col("blocked"), F.lit(False)))
          .withColumn("content", F.regexp_replace("content", "cheap", "affordable"))
          .select(F.col("recipient").alias("key"), "ts", "sender", "content")
    )),
)
stream = received.withColumnRenamed("key", "recipient")
valid = Processor(filt).run(
    {"received": stream, "blocker-table": blocker_table}
).outputs["valid"]

# --- collector: latest-5 messages per recipient (Value/SetValue list) ---
collector = define_group(
    "collector",
    input_stream("valid"),
    persist(AggFold({
        "latest": latest_n_list(
            F.concat_ws(": ", "sender", "content"),
            F.struct("ts", "sender"), 5),
    })),
)
feed = View(Processor(collector).run({"valid": valid}).table)

alice = feed.get("alice")["latest"]
assert alice == ["bob: hey how are you", "bob: lunch later?"], alice
assert feed.get("carol") is None  # only spam, all filtered
print("alice feed:", alice)

# --- detector (3-messaging/detector): auto-block by output rate ---
detector = define_group(
    "detector",
    input_stream("received", key="sender", contributes=False),
    loop(lambda df: df.withColumn("key", F.col("sender"))),
    persist(AggFold({"sent": F.count("*")}, having=F.col("sent") >= 3)),
)
flagged = Processor(detector).run({"received": stream}).table
assert [r.key for r in flagged.collect()] == ["spammer"]
print("auto-flagged:", [r.key for r in flagged.collect()])
print("OK")
