"""Runtime statistics — goka's Stats surface (stats.go, web/monitor).

goka exposes per-partition processor/view stats (offsets, counts,
recovery state).  The Spark analogs are computed from the plan and the
data in one aggregation job per frame: key counts, partition counts,
and per-output row counts.  (Executor-level metrics live in the Spark
UI / metrics system; this is the programmatic per-graph view.)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from goka_spark.operators.processor import KEY, ProcessorResult


def table_stats(result: ProcessorResult) -> dict[str, Any]:
    """TableStats analog: key count + partitioning of the group table."""
    if result.table is None:
        return {"keys": 0, "partitions": 0}
    row = result.table.agg(
        F.count("*").alias("keys"),
        F.count_distinct(KEY).alias("distinct_keys"),
    ).first()
    return {
        "keys": row["keys"],
        "distinct_keys": row["distinct_keys"],
        "partitions": result.table.rdd.getNumPartitions(),
        "unique_key_invariant": row["keys"] == row["distinct_keys"],
    }


def processor_stats(result: ProcessorResult) -> dict[str, Any]:
    """ProcessorStats analog: group, input volume, outputs, table."""
    enriched = result.enriched
    per_topic = {}
    if enriched is not None and "_topic" in enriched.columns:
        for r in enriched.groupBy("_topic").count().collect():
            per_topic[r["_topic"]] = r["count"]
    return {
        "group": result.graph.group,
        "input_counts": per_topic,
        "output_counts": {t: df.count() for t, df in result.outputs.items()},
        "table": table_stats(result),
    }


def view_stats(tracker, query=None) -> dict[str, Any]:
    """ViewStats analog (stats.go:54 PartitionProcStats / :74
    TableStats carried by View.Stats, view.go:481): the lifecycle
    state + recovery flag from the ``ViewStateTracker`` and, when the
    live StreamingQuery is provided, the InputStats-shaped progress
    numbers (rows, rates, batch timing) from its last progress —
    Spark's analog of per-partition offset/lag counters."""
    from goka_spark.streaming.runtime import view_state_name

    out: dict[str, Any] = {
        "state": view_state_name(tracker.current_state()),
        "recovered": tracker.recovered(),
    }
    if query is not None:
        lp = query.lastProgress or {}
        dur = lp.get("durationMs") or {}
        out["input"] = {
            "batch_id": lp.get("batchId", -1),
            "num_input_rows": lp.get("numInputRows", 0),
            "input_rows_per_second": lp.get("inputRowsPerSecond", 0.0),
            "processed_rows_per_second":
                lp.get("processedRowsPerSecond", 0.0),
            "trigger_duration_ms": dur.get("triggerExecution", 0),
        }
        out["active"] = query.isActive
    return out
