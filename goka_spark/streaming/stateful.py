"""Custom stateful streaming fold — goka's imperative callback, live.

``stateful_fold`` is the streaming twin of ``PyFold``: per key, the
user function folds each micro-batch's rows (event-time ordered
within the batch) into persistent state held by Spark's state store
(``applyInPandasWithState``).  This is exactly goka's
Value()/SetValue() loop (context.go:256-273) with the state store
playing LevelDB+changelog.

Timeouts map to goka's table eviction: a key idle past ``ttl`` emits
its final state and is dropped (processor table semantics under
retention).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_fold(
    stream: DataFrame,
    key_col: str,
    func: Callable[[Any, dict], Any],
    state_schema: str,
    init: Any = None,
    order_by: Optional[list[str]] = None,
    ttl_ms: Optional[int] = None,
    finish: Optional[Callable[[Any], dict]] = None,
) -> DataFrame:
    """Continuously fold ``func(state, row) -> state`` per key.

    Emits one row (key, *state) per key per micro-batch that touched
    the key.  ``state_schema`` is the DDL of the emitted state columns;
    internal persistence is a JSON blob so arbitrary Python state works
    (goka codecs analog: the state codec is JSON here).
    """
    out_schema = f"{key_col} string, {state_schema}"
    order_cols = order_by or []
    state_fields = [f.strip().split()[0] for f in state_schema.split(",")]

    def process(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (blob,) = state.get
            st = json.loads(blob)
        else:
            st = init() if callable(init) else init
        for pdf in pdfs:
            if order_cols:
                pdf = pdf.sort_values(order_cols, kind="stable")
            for row in pdf.to_dict("records"):
                st = func(st, row)
        state.update((json.dumps(st),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = finish(st) if finish else st
        rec = {key_col: key[0]}
        if isinstance(out, dict):
            rec.update({k: out.get(k) for k in state_fields})
        else:
            rec[state_fields[0]] = out
        yield pd.DataFrame([rec])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            process,
            outputStructType=out_schema,
            stateStructType="blob string",
            outputMode="update",
            timeoutConf=timeout,
        )
    )
