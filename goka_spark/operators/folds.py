"""Fold specifications — how a processor callback builds the group table.

goka's ProcessCallback (reference: /root/reference/processor.go,
context.go:256-273 Value/SetValue) folds messages into per-key state
in arrival order.  Spark-first we split this into:

- ``AggFold`` — declarative: named Column aggregate expressions,
  compiled to ``groupBy(key).agg(...)``.  Runs fully JVM-side with
  map-side partial aggregation and whole-stage codegen; this is the
  scale path and covers counters, sums, min/max, last-value,
  collect-list-style state.
- ``ReduceFold`` — order-sensitive built-ins expressed with window
  functions over (key, ts) then a last-row pick; still JVM-side.
- ``PyFold`` — arbitrary imperative fold, the explicit slow path:
  Arrow-batched ``applyInPandas`` per key, rows sorted by event time,
  exactly goka's per-key ordered-callback semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Fold:
    """Base: compile(df, key_col, ts_col) -> group-table DataFrame."""

    def compile(self, df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
        raise NotImplementedError


@dataclass
class AggFold(Fold):
    """Declarative per-key state: ``{state_field: aggregate Column}``.

    Order-dependent aggregates should use the ``_ordered`` helpers
    (e.g. ``last_by``) which are deterministic w.r.t. event time.
    """

    aggs: dict[str, Column]
    having: Optional[Column] = None

    def compile(self, df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
        out = df.groupBy(key_col).agg(
            *[c.alias(name) for name, c in self.aggs.items()]
        )
        if self.having is not None:
            out = out.filter(self.having)
        return out


@dataclass
class ReduceFold(Fold):
    """Keep the state produced by the *last* message per key, where the
    state columns are row-level expressions (goka: callback that only
    looks at the current message + SetValue).

    Compiled JVM-side: ``max_by(struct(state...), (ts, tiebreak))`` —
    a single hash aggregation, no window/sort shuffle.
    """

    exprs: dict[str, Column]
    tiebreak: Optional[Column] = None

    def compile(self, df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
        state = F.struct(*[c.alias(n) for n, c in self.exprs.items()])
        order = F.struct(
            F.col(ts_col).alias("_ts"),
            (self.tiebreak if self.tiebreak is not None else F.lit(0)).alias("_tb"),
        )
        picked = df.groupBy(key_col).agg(F.max_by(state, order).alias("_state"))
        return picked.select(key_col, "_state.*")


@dataclass
class PyFold(Fold):
    """Arbitrary ordered fold — goka's imperative callback, verbatim
    semantics: per key, messages sorted by (ts, *order_extra*), state
    threaded through ``func(state, row) -> state``.

    ``state_schema`` is a DDL string for the emitted state columns
    (key column is added automatically).  Rows arrive as dicts.
    Executed via ``applyInPandas`` (Arrow batches; one group = one
    pandas DataFrame), so per-key data must fit in executor memory —
    same constraint goka has (state lives on one partition's disk).
    """

    func: Optional[Callable[[Any, dict], Any]] = None
    state_schema: str = ""
    init: Any = None
    finish: Optional[Callable[[Any], dict]] = None
    order_extra: list[str] = field(default_factory=list)
    # optional vectorized fold: called ONCE per key with the sorted
    # pandas frame instead of row-at-a-time func — use when the fold
    # is expressible with pandas/numpy ops (10-50× less Python churn).
    batch_func: Optional[Callable[[pd.DataFrame], Any]] = None

    def compile(self, df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
        if not self.state_schema or (self.func is None and self.batch_func is None):
            raise ValueError("PyFold needs state_schema and func or batch_func")
        func, init, finish = self.func, self.init, self.finish
        batch_func = self.batch_func
        order_cols = [ts_col] + self.order_extra
        out_schema = f"{key_col} string, {self.state_schema}"
        state_fields = [
            f.split()[0] for f in self.state_schema.split(",")
        ]

        def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_cols, kind="stable")
            if batch_func is not None:
                state = batch_func(pdf)
            else:
                state = init() if callable(init) else init
                for row in pdf.to_dict("records"):
                    state = func(state, row)
            out = finish(state) if finish else state
            rec = {key_col: pdf[key_col].iloc[0]}
            if isinstance(out, dict):
                rec.update(out)
            else:
                rec[state_fields[0]] = out
            return pd.DataFrame([rec])

        return df.groupBy(key_col).applyInPandas(fold_group, schema=out_schema)


FoldLike = Union[AggFold, ReduceFold, PyFold]


def last_by(value: Column, order: Column) -> Column:
    """Deterministic 'last value wins' aggregate (JVM-side max_by)."""
    return F.max_by(value, order)


def first_by(value: Column, order: Column) -> Column:
    return F.min_by(value, order)


def latest_n_list(value: Column, order: Column, n: int) -> Column:
    """Latest-N collector state (goka examples/3-messaging collector):
    keep the last ``n`` values per key ordered by event time.

    JVM-side: sort_array over (order, value) structs, slice the tail.
    """
    pairs = F.collect_list(F.struct(order.alias("o"), value.alias("v")))
    sorted_pairs = F.sort_array(pairs)
    tail = F.slice(sorted_pairs, F.greatest(F.size(sorted_pairs) - (n - 1), F.lit(1)), n)
    return F.transform(tail, lambda s: s["v"])
