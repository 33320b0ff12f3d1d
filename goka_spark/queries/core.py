"""A-block queries — goka core surface exercised end-to-end.

Each query builds a GroupGraph with the public API and runs the batch
Processor over the driver's parquet topics; the matching DuckDB
oracle is in ``ORACLES``.  Reference semantics cited per query.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goka_spark import (
    AggFold,
    Emitter,
    Int64Codec,
    Processor,
    PyFold,
    define_group,
    input_stream,
    join,
    lookup,
    loop,
    output,
    persist,
    visitor,
)
from goka_spark.operators.folds import latest_n_list
from goka_spark.queries.base import load

def _order():
    """Deterministic "last message wins" ordering (goka: offset order)."""
    return F.struct(F.col("ts").alias("_ts"), F.col("event_id").alias("_id"))


def _count_graph():
    """examples/1-simplest/main.go:48-66 — per-key counter."""
    return define_group(
        "clicks",
        input_stream("events", key="user_id"),
        persist(AggFold({"cnt": F.count("*")})),
    )


def proc_count_per_key(spark: SparkSession, sf: str) -> DataFrame:
    t = load(spark, sf, "events")
    return Processor(_count_graph()).run(t).table


def proc_agg_state(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-field state struct per key (ctx.SetValue with a struct)."""
    g = define_group(
        "user-stats",
        input_stream("events", key="user_id"),
        persist(AggFold({
            "cnt": F.count("*"),
            "sum_value": F.round(F.sum("value"), 3),
            "max_ts_us": F.unix_micros(F.max("ts")),
            "last_type": F.max_by("event_type", _order()),
        })),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def proc_latest_n(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-5 collector (examples/3-messaging/collector/collector.go:29)."""
    g = define_group(
        "collector",
        input_stream("events", key="user_id"),
        persist(AggFold({
            "last5": F.array_join(
                latest_n_list(F.col("event_id").cast("string"), _order(), 5), ","
            ),
        })),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def proc_fold_generic(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary ordered imperative fold (context.go:256-273): an
    exponentially-decayed balance, order-dependent by construction."""

    def ewma(state, row):
        return state * 0.9 + row["value"]

    g = define_group(
        "ewma",
        input_stream("events", key="user_id"),
        persist(PyFold(
            func=ewma,
            init=0.0,
            finish=lambda s: {"ewma": round(s, 3)},
            state_schema="ewma double",
            order_extra=["event_id"],
            # the callback reads only row["value"]; declaring it
            # drops the event_type/props payload columns from the
            # Arrow transfer (guide §4.1) — same rows, same fold
            needs=["value"],
        )),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def stream_table_join(spark: SparkSession, sf: str) -> DataFrame:
    """ctx.Join with a co-partitioned table (context.go:305)."""
    g = define_group(
        "purchase-by-segment",
        input_stream("events", key="user_id"),
        join("customer", on="c_custkey"),
        persist(AggFold({
            "cnt": F.count("*"),
            "segment": F.max("c_mktsegment"),
            "sum_value": F.round(F.sum("value"), 3),
        })),
    )
    return Processor(g).run(load(spark, sf, "events", "customer")).table


def stream_lookup_join(spark: SparkSession, sf: str) -> DataFrame:
    """ctx.Lookup on a foreign table (context.go:327) — broadcast join
    over customer→nation, aggregated per nation name."""
    g = define_group(
        "nation-volume",
        input_stream("events", key="user_id"),
        join("customer", on="c_custkey"),
        lookup("nation", on="c_nationkey", table_key="n_nationkey"),
        output("by_nation", transform=lambda df: (
            df.groupBy(F.col("n_name").alias("nation"))
              .agg(F.count("*").alias("cnt"),
                   F.round(F.sum("value"), 3).alias("sum_value"))
        )),
    )
    r = Processor(g).run(load(spark, sf, "events", "customer", "nation"))
    return r.outputs["by_nation"]


def output_stream(spark: SparkSession, sf: str) -> DataFrame:
    """ctx.Emit to an output topic (3-messaging blocker/filter):
    filter + project, no state."""
    g = define_group(
        "forwarder",
        input_stream("events", key="user_id",
                     where=F.col("event_type") == "purchase"),
        output("purchases", transform=lambda df: df.select(
            "key", "event_id", "value", F.unix_micros("ts").alias("ts_us"))),
    )
    r = Processor(g).run(load(spark, sf, "events"))
    return r.outputs["purchases"]


def loopback_rekey(spark: SparkSession, sf: str) -> DataFrame:
    """ctx.Loopback (context.go:220; 3-messaging detector): phase-1
    callback only re-keys (contributes=False); the loop callback folds
    into a table keyed by event_type."""
    g = define_group(
        "type-stats",
        input_stream("events", key="user_id", contributes=False),
        loop(lambda df: df.withColumn("key", F.col("event_type"))),
        persist(AggFold({
            "cnt": F.count("*"),
            "sum_value": F.round(F.sum("value"), 3),
        })),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def view_point_get(spark: SparkSession, sf: str) -> DataFrame:
    """View.Get (view.go:333) as a pushed-down key filter."""
    table = Processor(_count_graph()).run(load(spark, sf, "events")).table
    return table.filter(F.col("key") == "7")


def view_range_scan(spark: SparkSession, sf: str) -> DataFrame:
    """View.IteratorWithRange (view.go:397): keys in ['10','20')."""
    from goka_spark.operators.view import View

    table = Processor(_count_graph()).run(load(spark, sf, "events")).table
    return View(table).range_df("10", "20")


def view_iterate_all(spark: SparkSession, sf: str) -> DataFrame:
    """View.Iterator (view.go:374): full key-ordered scan."""
    table = Processor(_count_graph()).run(load(spark, sf, "events")).table
    return table.orderBy("key")


def visitor_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Processor.VisitAllWithStats: run a transform over every key."""
    g = define_group(
        "visited",
        input_stream("events", key="user_id"),
        persist(AggFold({"cnt": F.count("*")})),
        visitor("double", lambda t: t.withColumn("cnt2", F.col("cnt") * 2)),
    )
    r = Processor(g).run(load(spark, sf, "events"))
    return r.visit("double")


def emitter_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Emitter → topic dataset → read back (emitter.go:28-124).
    Rows-only check: exercises the write/read path."""
    path = os.path.join(tempfile.gettempdir(), "goka_spark_emit_rt")
    em = Emitter(spark, path, codec=Int64Codec())
    table = proc_count_per_key(spark, sf)
    em.emit_dataframe(table.withColumnRenamed("cnt", "value"), mode="overwrite")
    return em.read()


def proc_delete_key(spark: SparkSession, sf: str) -> DataFrame:
    """ctx.Delete (context.go:247): tombstone keys whose final message
    is an 'error' — they vanish from the group table."""
    g = define_group(
        "live-users",
        input_stream("events", key="user_id"),
        persist(AggFold(
            {"cnt": F.count("*"),
             "_last_type": F.max_by("event_type", _order())},
            having=F.col("_last_type") != "error",
        )),
    )
    return Processor(g).run(load(spark, sf, "events")).table.drop("_last_type")


def multi_input_merge(spark: SparkSession, sf: str) -> DataFrame:
    """goka.Inputs (graph.go:320): one callback over several topics."""
    t = load(spark, sf, "events")
    clicks = t["events"].filter(F.col("event_type").isin("click", "view"))
    tx = t["events"].filter(F.col("event_type").isin("purchase", "signup"))
    g = define_group(
        "merged",
        input_stream("clicks", key="user_id"),
        input_stream("tx", key="user_id"),
        persist(AggFold({"cnt": F.count("*")})),
    )
    return Processor(g).run({"clicks": clicks, "tx": tx}).table


def proc_headers(spark: SparkSession, sf: str) -> DataFrame:
    """Message headers (headers.go) modeled as a JSON side-channel:
    parse props, aggregate a header field per key."""
    g = define_group(
        "hdr",
        input_stream("events", key="user_id", select=lambda df: df.withColumn(
            "hdr_k", F.get_json_object("props", "$.k").cast("long"))),
        persist(AggFold({"sum_k": F.sum("hdr_k")})),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def proc_headers_native(spark: SparkSession, sf: str) -> DataFrame:
    """Headers as a first-class ``map<string,binary>`` column
    (headers.go:8, EmitWithHeaders emitter.go:60): the topic carries a
    real headers map (lifted here from the JSON props shape), the
    processor reads header bytes with map accessors — all JVM codegen,
    no JSON parse in the fold."""
    from goka_spark.headers import from_props, header_long

    g = define_group(
        "hdr-native",
        input_stream("events", key="user_id", select=lambda df: (
            df.withColumn("headers", from_props(F.col("props"), "k"))
              .withColumn("hdr_k", header_long("k")))),
        persist(AggFold({"sum_k": F.sum("hdr_k")})),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def codec_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """codec Int64 encode→decode identity, JVM-side (codec/codec.go:51-66)."""
    c = Int64Codec()
    ev = load(spark, sf, "events")["events"]
    return ev.select(
        "event_id",
        c.decode_col(c.encode_col(F.col("user_id"))).alias("decoded"),
    )


def proc_last_state(spark: SparkSession, sf: str) -> DataFrame:
    """ReduceFold: the state is whatever the LAST message wrote
    (pure ctx.SetValue(msg) callback) — one max_by hash-agg, no window."""
    from goka_spark.operators.folds import ReduceFold

    g = define_group(
        "last-state",
        input_stream("events", key="user_id"),
        persist(ReduceFold(
            {"last_type": F.col("event_type"),
             "last_value": F.col("value"),
             "last_event": F.col("event_id")},
            tiebreak=F.col("event_id"),
        )),
    )
    return Processor(g).run(load(spark, sf, "events")).table


def changelog_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Compacted table topic (graph.go:44): two epochs of deltas +
    a tombstone, read back compacted (last-write-wins, deletes drop).
    Rows-only: exercises the append/compact/replay path."""
    import shutil

    from goka_spark.operators.changelog import ChangelogTable

    path = os.path.join(tempfile.gettempdir(), "goka_spark_changelog_q")
    shutil.rmtree(path, ignore_errors=True)
    cl = ChangelogTable(spark, path)
    table = proc_count_per_key(spark, sf)
    cl.append_delta(table)
    # epoch 2: bump every key's count by 1, tombstone key '0'
    cl.append_delta(
        table.withColumn("cnt", F.col("cnt") + 1)
             .withColumn("dead", F.col("key") == "0"),
        tombstone="dead")
    return cl.read_compacted()


QUERIES = {
    "proc_count_per_key": proc_count_per_key,
    "proc_agg_state": proc_agg_state,
    "proc_latest_n": proc_latest_n,
    "proc_fold_generic": proc_fold_generic,
    "stream_table_join": stream_table_join,
    "stream_lookup_join": stream_lookup_join,
    "output_stream": output_stream,
    "loopback_rekey": loopback_rekey,
    "view_point_get": view_point_get,
    "view_range_scan": view_range_scan,
    "view_iterate_all": view_iterate_all,
    "visitor_apply": visitor_apply,
    "emitter_roundtrip": emitter_roundtrip,
    "proc_delete_key": proc_delete_key,
    "multi_input_merge": multi_input_merge,
    "proc_headers": proc_headers,
    "proc_headers_native": proc_headers_native,
    "codec_roundtrip": codec_roundtrip,
    "changelog_compaction": changelog_compaction,
    "proc_last_state": proc_last_state,
}

_COUNT_SQL = (
    "SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt "
    "FROM events GROUP BY user_id"
)

ORACLES = {
    "proc_count_per_key": _COUNT_SQL,
    "proc_agg_state": """
        SELECT CAST(user_id AS VARCHAR) AS key,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 3) AS sum_value,
               epoch_us(MAX(ts)) AS max_ts_us,
               LAST(event_type ORDER BY ts, event_id) AS last_type
        FROM events GROUP BY user_id
    """,
    "proc_latest_n": """
        SELECT CAST(user_id AS VARCHAR) AS key,
               array_to_string(
                 list(CAST(event_id AS VARCHAR) ORDER BY ts, event_id)[-5:], ','
               ) AS last5
        FROM events GROUP BY user_id
    """,
    "proc_fold_generic": """
        SELECT key, ROUND(SUM(value * POWER(0.9, cnt - rn)), 3) AS ewma
        FROM (
          SELECT CAST(user_id AS VARCHAR) AS key, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS cnt
          FROM events
        ) GROUP BY key
    """,
    "stream_table_join": """
        SELECT CAST(e.user_id AS VARCHAR) AS key,
               COUNT(*) AS cnt,
               MAX(c.c_mktsegment) AS segment,
               ROUND(SUM(e.value), 3) AS sum_value
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY e.user_id
    """,
    "stream_lookup_join": """
        SELECT n.n_name AS nation, COUNT(*) AS cnt,
               ROUND(SUM(e.value), 3) AS sum_value
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "output_stream": """
        SELECT CAST(user_id AS VARCHAR) AS key, event_id, value,
               epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    """,
    "loopback_rekey": """
        SELECT event_type AS key, COUNT(*) AS cnt,
               ROUND(SUM(value), 3) AS sum_value
        FROM events GROUP BY event_type
    """,
    "view_point_get": f"SELECT * FROM ({_COUNT_SQL}) WHERE key = '7'",
    "view_range_scan": (
        f"SELECT * FROM ({_COUNT_SQL}) WHERE key >= '10' AND key < '20'"
    ),
    "view_iterate_all": _COUNT_SQL,
    "visitor_apply": (
        f"SELECT key, cnt, cnt * 2 AS cnt2 FROM ({_COUNT_SQL})"
    ),
    # emitter_roundtrip: rows-only (write/read side-effect path)
    "proc_delete_key": """
        SELECT key, cnt FROM (
          SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt,
                 LAST(event_type ORDER BY ts, event_id) AS last_type
          FROM events GROUP BY user_id
        ) WHERE last_type <> 'error'
    """,
    "multi_input_merge": """
        SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt
        FROM events
        WHERE event_type IN ('click','view','purchase','signup')
        GROUP BY user_id
    """,
    "proc_headers_native": """
        SELECT CAST(user_id AS VARCHAR) AS key,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY user_id
    """,
    "proc_headers": """
        SELECT CAST(user_id AS VARCHAR) AS key,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY user_id
    """,
    "codec_roundtrip": "SELECT event_id, user_id AS decoded FROM events",
}

ORACLES["proc_last_state"] = """
    SELECT CAST(user_id AS VARCHAR) AS key,
           LAST(event_type ORDER BY ts, event_id) AS last_type,
           LAST(value ORDER BY ts, event_id) AS last_value,
           LAST(event_id ORDER BY ts, event_id) AS last_event
    FROM events GROUP BY user_id
"""
