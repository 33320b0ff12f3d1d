"""transformWithState-based stateful fold — timers + multiple state
variables (Spark 4's successor of applyInPandasWithState).

Feature-parity target: goka's full Context surface on a live
processor — Value/SetValue (value state), per-key timers (table TTL /
scheduled callbacks), and multiple named state variables per key
(goka processors get one table; joins add more — here they're
first-class ``getValueState`` handles).

ENVIRONMENT GATE: Spark's ``transformWithStateInPandas`` Python
worker speaks protobuf to the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2) and this container
ships no ``google.protobuf`` — so this module is import-complete but
executable only where protobuf is installed (any standard Spark
cluster).  ``HAVE_TWS`` reports availability; tests skip without it.
The running path in this container is
``stateful.stateful_fold`` (applyInPandasWithState), which needs no
protobuf.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

try:  # the Python worker needs protobuf at runtime
    from google.protobuf import descriptor  # noqa: F401
    HAVE_TWS = True
except ImportError:
    HAVE_TWS = False


def tws_conf() -> dict[str, str]:
    """transformWithState requires the RocksDB state store provider."""
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }


def stateful_fold_tws(
    stream: DataFrame,
    key_col: str,
    func: Callable[[Any, dict], Any],
    state_schema: str,
    init: Any = None,
    order_by: Optional[list[str]] = None,
    ttl_ms: Optional[int] = None,
    finish: Optional[Callable[[Any], dict]] = None,
) -> DataFrame:
    """``stateful_fold`` on the transformWithState engine: same
    contract, plus real per-key timers — a key idle past ``ttl_ms``
    emits its final state from ``handleExpiredTimer`` and is deleted
    (goka table eviction, processor.go VisitValues write access)."""
    if not HAVE_TWS:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "environment does not provide — use stateful.stateful_fold")

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = f"{key_col} string, {state_schema}"
    order_cols = order_by or []
    state_fields = [f.strip().split()[0] for f in state_schema.split(",")]

    def emit(key: str, st) -> "pd.DataFrame":
        out = finish(st) if finish else st
        rec = {key_col: key}
        if isinstance(out, dict):
            rec.update({k: out.get(k) for k in state_fields})
        else:
            rec[state_fields[0]] = out
        return pd.DataFrame([rec])

    class FoldProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # multiple named state variables per key: the fold blob +
            # a bookkeeping timer slot (goka: table + lifecycle)
            self._blob = handle.getValueState("blob", "blob string")
            self._handle = handle

        def handleInputRows(self, key, rows, timer_values):
            st = (json.loads(self._blob.get()[0]) if self._blob.exists()
                  else (init() if callable(init) else init))
            for pdf in rows:
                if order_cols:
                    pdf = pdf.sort_values(order_cols, kind="stable")
                for row in pdf.to_dict("records"):
                    st = func(st, row)
            self._blob.update((json.dumps(st),))
            if ttl_ms is not None:
                now = timer_values.getCurrentProcessingTimeInMs()
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer(now + ttl_ms)
            yield emit(key[0], st)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # eviction emits the final state before dropping the key
            if self._blob.exists():
                st = json.loads(self._blob.get()[0])
                self._blob.clear()
                yield emit(key[0], st)

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        FoldProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
