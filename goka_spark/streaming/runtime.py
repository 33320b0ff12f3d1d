"""Structured Streaming runtime — the live-topic face of a GroupGraph.

goka's Processor tails Kafka forever, folding each message into the
group table and emitting outputs (processor.go Run loop).  The Spark
equivalent: ``readStream`` sources → the same declarative enrichment
the batch Processor builds → a streaming aggregation (state store) or
an ``applyInPandasWithState`` fold → ``writeStream`` sinks.

Scale/production notes baked in:
- watermarks bound state (late-data policy is explicit),
- ``rocksdb_state_conf`` returns the config a real cluster uses so
  100 TB state spills to RocksDB instead of executor heap,
- ``ExactlyOnceBatchSink`` reproduces DeferCommit/exactly-once
  (context.go:473): a foreachBatch writer that skips replayed epochs,
  so sink writes are idempotent under restart.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goka_spark import hadoop_fs as FS
from goka_spark.graph import GroupGraph
from goka_spark.operators.processor import KEY, Processor


def rocksdb_state_conf() -> dict[str, str]:
    """State-store config for real clusters (large keyed state)."""
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def stream_from_dir(spark: SparkSession, path: str, schema: str,
                    max_files: int = 1) -> DataFrame:
    """File-source stream (the test/demo stand-in for a Kafka topic;
    swap for ``spark.readStream.format('kafka')`` in production)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


class StreamingProcessor:
    """Run a GroupGraph against streaming input topics.

    ``AggFold`` persists as an incremental streaming aggregation (the
    scale path); ``PyFold`` graphs automatically route through the
    state store (``applyInPandasWithState``) with the same fold
    function the batch Processor replays.
    """

    def __init__(self, graph: GroupGraph, watermark: Optional[tuple[str, str]] = None):
        self.graph = graph
        self.watermark = watermark  # (ts_col, delay) e.g. ("ts", "10 minutes")
        self._batch = Processor(graph)

    def table_stream(self, topics: dict[str, DataFrame], ts_col: str = "ts") -> DataFrame:
        """The group table as a continuously-updating aggregation."""
        g = self.graph
        if g.persist_edge is None:
            raise ValueError("graph has no Persist edge")
        stream = self._batch.enrich(topics)
        if self.watermark is not None:
            stream = stream.withWatermark(*self.watermark)
        if g.loop_edge is not None:
            looped = g.loop_edge.rekey(stream)
            contributing = [e.topic for e in g.input_edges if e.contributes]
            if contributing:
                base = stream.filter(F.col("_topic").isin(contributing)) \
                    if len(contributing) < len(g.input_edges) else stream
                stream = base.unionByName(looped, allowMissingColumns=True)
            else:
                stream = looped
        fold = g.persist_edge.fold
        from goka_spark.operators.folds import PyFold

        if isinstance(fold, PyFold):
            # imperative callbacks fold through the state store
            # (applyInPandasWithState), not a streaming aggregation
            if fold.func is None:
                raise ValueError(
                    "streaming PyFold requires a row-level `func`: "
                    "`batch_func` folds one whole (sorted) group at once "
                    "and cannot thread state across micro-batches")
            from goka_spark.streaming.stateful import stateful_fold

            return stateful_fold(
                stream, KEY, fold.func, fold.state_schema,
                init=fold.init, order_by=[ts_col] + fold.order_extra,
                finish=fold.finish)
        return fold.compile(stream, KEY, ts_col)

    def output_streams(self, topics: dict[str, DataFrame]) -> dict[str, DataFrame]:
        stream = self._batch.enrich(topics)
        outs = {}
        for oe in self.graph.output_edges:
            outs[oe.topic] = oe.transform(stream) if oe.transform else stream
        return outs

    def start_table(self, topics: dict[str, DataFrame], *, queryName: str,
                    checkpoint: str, output_mode: Optional[str] = None,
                    fmt: str = "memory", **options: Any):
        """NOTE: the memory sink only supports checkpoint *recovery* in
        complete mode — for restart-safe PyFold (update-mode) tables use
        ``table_stream(...).writeStream.foreachBatch(ExactlyOnceBatchSink(...))``.
        """
        if output_mode is None:
            from goka_spark.operators.folds import PyFold

            # applyInPandasWithState only supports update mode
            output_mode = ("update" if isinstance(self.graph.persist_edge.fold,
                                                  PyFold) else "complete")
        df = self.table_stream(topics)
        return (
            df.writeStream.queryName(queryName)
            .outputMode(output_mode)
            .format(fmt)
            .option("checkpointLocation", checkpoint)
            .options(**options)
            .start()
        )


class ExactlyOnceBatchSink:
    """foreachBatch sink with epoch-dedup — goka DeferCommit semantics
    (context.go:473): the offset only commits once the side effect is
    durable, and replayed epochs are no-ops.

    Each epoch writes to its own partition directory
    ``data/epoch_id=N/`` with mode=overwrite, so a crash *between*
    data write and ledger update is safe: the replayed epoch simply
    overwrites its own directory (idempotent), never re-appends.  The
    ledger is a fast-path skip + commit marker, not the correctness
    mechanism.

    The ledger is WATERMARK-COMPACTED, so it stays O(1) over an
    unbounded stream: ``{"hw": N, "sparse": [...]}`` means every
    epoch <= N is committed, plus the (normally empty) out-of-order
    set above N — epochs arrive in order from the streaming engine,
    so the sparse set only grows across a crash window and drains as
    the watermark advances.  The v1 plain-list format still loads.

    Ledger IO goes through the Hadoop FileSystem API (hadoop_fs.py),
    so ``path`` may be any Hadoop-FS URI — the checkpoint-grade store
    (HDFS/S3) a production stream commits to, not just local disk.
    ``replace_file`` is delete+rename (HDFS rename can't overwrite);
    a crash in that gap loses only the marker: every epoch dir is
    overwrite-idempotent, so the replay rewrites identical data.
    """

    def __init__(self, path: str):
        self.path = path
        self._ledger = FS.uri_join(path, "_committed_epochs.json")

    def _spark(self) -> SparkSession:
        spark = SparkSession.getActiveSession()
        if spark is None:  # pragma: no cover - sink always runs in-session
            raise RuntimeError("ExactlyOnceBatchSink needs an active "
                               "SparkSession for ledger IO")
        return spark

    def _state(self) -> tuple[int, set[int]]:
        """(high watermark, sparse committed epochs above it)."""
        spark = self._spark()
        if not FS.exists(spark, self._ledger):
            return -1, set()
        obj = json.loads(FS.read_bytes(spark, self._ledger).decode("utf-8"))
        if isinstance(obj, list):  # v1 ledger: plain epoch list
            hw, sparse = -1, set(obj)
        else:
            hw, sparse = int(obj["hw"]), set(obj["sparse"])
        while hw + 1 in sparse:  # compact: contiguous prefix -> hw
            hw += 1
            sparse.discard(hw)
        return hw, sparse

    def _committed(self) -> set[int]:
        """Compat shim for callers/tests that inspect the ledger: the
        committed set with the watermark expanded."""
        hw, sparse = self._state()
        return set(range(hw + 1)) | sparse

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        epoch_id = int(epoch_id)
        hw, sparse = self._state()
        if epoch_id <= hw or epoch_id in sparse:
            return  # replay after restart: skip, already durable
        epoch_dir = FS.uri_join(self.path, "data", f"epoch_id={epoch_id}")
        batch_df.write.mode("overwrite").parquet(epoch_dir)
        sparse.add(epoch_id)
        while hw + 1 in sparse:
            hw += 1
            sparse.discard(hw)
        spark = batch_df.sparkSession
        tmp = self._ledger + ".tmp"
        FS.write_bytes(spark, tmp, json.dumps(
            {"hw": hw, "sparse": sorted(sparse)}).encode("utf-8"))
        FS.replace_file(spark, tmp, self._ledger)  # commit marker

    def read(self, spark: SparkSession) -> DataFrame:
        """All committed rows (partition column ``epoch_id`` dropped)."""
        return spark.read.parquet(FS.uri_join(self.path, "data")).drop("epoch_id")


# ---------------------------------------------------------------------------
# View lifecycle observation (reference view.go:15 ViewState,
# :449 CurrentState, :475 ObserveStateChanges, :431 Recovered)
# ---------------------------------------------------------------------------

class ViewState(int):
    """goka's view state machine constants (view.go:19-28)."""


VIEW_STATE_IDLE = ViewState(0)
VIEW_STATE_INITIALIZING = ViewState(1)
VIEW_STATE_CONNECTING = ViewState(2)
VIEW_STATE_CATCHUP = ViewState(3)
VIEW_STATE_RUNNING = ViewState(4)

_VIEW_STATE_NAMES = {
    VIEW_STATE_IDLE: "Idle",
    VIEW_STATE_INITIALIZING: "Initializing",
    VIEW_STATE_CONNECTING: "Connecting",
    VIEW_STATE_CATCHUP: "CatchUp",
    VIEW_STATE_RUNNING: "Running",
}


def view_state_name(s: int) -> str:
    return _VIEW_STATE_NAMES.get(int(s), str(int(s)))


class StateChangeObserver:
    """Channel-of-states (view.go:475): read transitions from ``C``
    (a ``queue.Queue`` of ViewState); call ``stop()`` when done.
    Unlike the Go original there is no deadlock risk — the queue is
    unbounded — but ``stop()`` still detaches it from the tracker."""

    def __init__(self, unsubscribe) -> None:
        import queue

        self.C: "queue.Queue[int]" = queue.Queue()
        self._unsubscribe = unsubscribe

    def stop(self) -> None:
        self._unsubscribe(self)


class ViewStateTracker:
    """Lifecycle observation for a streaming View/table query — the
    parity surface for goka's ``View.CurrentState`` /
    ``ObserveStateChanges`` / ``Recovered`` (view.go:449/475/431).

    Spark's StreamingQueryListener events map onto the goka state
    machine:

    - query started                      → Initializing
    - progress with input rows           → CatchUp (replaying backlog)
    - progress with zero input / idle    → Running (caught up at the
      source head — goka's "all partitions recovered")
    - terminated with exception          → Connecting (a restart from
      checkpoint is the Spark analog of goka's reconnect loop)
    - terminated cleanly                 → Idle

    Like goka's Recovered(), ``recovered`` latches true the first
    time Running is reached and stays true while the query lives.
    Attach with ``tracker.attach(spark)`` BEFORE ``start()``;
    detach on teardown."""

    def __init__(self, query_name: str) -> None:
        import threading as _t

        self._name = query_name
        self._lock = _t.Lock()
        self._cv = _t.Condition(self._lock)
        self._state: int = VIEW_STATE_IDLE
        self._recovered = False
        self._observers: list[StateChangeObserver] = []
        self._listener = None
        self._qid: str = ""

    # -- goka-parity API --
    def current_state(self) -> int:
        with self._lock:
            return self._state

    def recovered(self) -> bool:
        with self._lock:
            return self._recovered

    def observe_state_changes(self) -> StateChangeObserver:
        obs = StateChangeObserver(self._unsubscribe)
        with self._lock:
            self._observers.append(obs)
        return obs

    def wait_for_state(self, state: int, timeout: float = 30.0) -> bool:
        """WaitForState (view.go:104 WaitRunning is
        ``wait_for_state(VIEW_STATE_RUNNING)``)."""
        deadline_state = int(state)
        with self._cv:
            return self._cv.wait_for(
                lambda: self._state == deadline_state, timeout)

    def wait_running(self, timeout: float = 30.0) -> bool:
        return self.wait_for_state(VIEW_STATE_RUNNING, timeout)

    # -- wiring --
    def _unsubscribe(self, obs: StateChangeObserver) -> None:
        with self._lock:
            if obs in self._observers:
                self._observers.remove(obs)

    def _set(self, state: int) -> None:
        with self._cv:
            if state == self._state:
                return  # signal semantics: notify on CHANGE only
            self._state = state
            if state == VIEW_STATE_RUNNING:
                self._recovered = True
            if state == VIEW_STATE_IDLE:
                self._recovered = False
            observers = list(self._observers)
            self._cv.notify_all()
        for obs in observers:
            obs.C.put(state)

    def attach(self, spark: SparkSession) -> "ViewStateTracker":
        from pyspark.sql.streaming import StreamingQueryListener

        # re-attach must not leak the previous listener (it would
        # keep firing duplicate transitions for the session's life)
        self.detach(spark)
        tracker = self

        class _Listener(StreamingQueryListener):
            # Idle/Terminated events carry no query NAME, only ids —
            # remember the id from the started event to match them.
            def onQueryStarted(self, event) -> None:
                if event.name == tracker._name:
                    tracker._qid = str(event.id)
                    tracker._set(VIEW_STATE_INITIALIZING)

            def onQueryProgress(self, event) -> None:
                p = event.progress
                if p.name != tracker._name:
                    return
                if p.numInputRows > 0:
                    tracker._set(VIEW_STATE_CATCHUP)
                else:
                    tracker._set(VIEW_STATE_RUNNING)

            def onQueryIdle(self, event) -> None:
                if str(event.id) != tracker._qid:
                    return
                # idle = no new data at the source head: caught up
                tracker._set(VIEW_STATE_RUNNING)

            def onQueryTerminated(self, event) -> None:
                if str(event.id) != tracker._qid:
                    return
                if event.exception is not None:
                    # failed — a checkpoint restart reconnects
                    tracker._set(VIEW_STATE_CONNECTING)
                else:
                    tracker._set(VIEW_STATE_IDLE)

        self._listener = _Listener()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        if self._listener is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def state_dict(self) -> dict:
        """JSON shape for web.MonitorServer's view-state endpoint."""
        with self._lock:
            return {"state": view_state_name(self._state),
                    "state_id": int(self._state),
                    "recovered": self._recovered}
