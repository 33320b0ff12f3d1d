"""GroupGraph DSL — declarative processor-group specification.

Mirrors goka's ``DefineGroup(group, Input(...), Persist(...), ...)``
(reference: /root/reference/graph.go:55-215, edge constructors
graph.go:304-417) as a Spark logical-plan builder.  Edges declare
*what* flows where; ``operators.processor.Processor`` compiles the
graph to a single declarative DataFrame plan so Catalyst sees the
whole pipeline (pushdown, join planning, AQE all apply end-to-end).

Differences from goka forced by the Spark model (documented, not
accidental):

- goka's per-message imperative callback is split into declarative
  edges (where/select/fold); arbitrary imperative folds remain
  available via ``PyFold`` (the explicit Arrow slow path).
- the group table is a DataFrame, not a LevelDB+changelog pair; its
  "changelog" is whatever sink you append it to.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

from pyspark.sql import Column, DataFrame

from goka_spark.codecs import Codec

ColumnLike = Union[str, Column]
Transform = Callable[[DataFrame], DataFrame]

# Topic-name suffixes for the group table / loop stream.  goka exposes
# these as process-global knobs (graph.go:19 SetTableSuffix, :25
# SetLoopSuffix, :31 ResetSuffixes) so deployments with their own
# topic-naming conventions can rename "<group>-table"/"<group>-loop";
# like the reference, the CURRENT suffix is read when DefineGroup runs
# (graph.go:476 tableName / :481 loopName evaluate it at call time).
_DEFAULT_TABLE_SUFFIX = "-table"
_DEFAULT_LOOP_SUFFIX = "-loop"
_table_suffix = _DEFAULT_TABLE_SUFFIX
_loop_suffix = _DEFAULT_LOOP_SUFFIX


def set_table_suffix(suffix: str) -> None:
    """goka SetTableSuffix (graph.go:19)."""
    global _table_suffix
    _table_suffix = suffix


def set_loop_suffix(suffix: str) -> None:
    """goka SetLoopSuffix (graph.go:25)."""
    global _loop_suffix
    _loop_suffix = suffix


def reset_suffixes() -> None:
    """goka ResetSuffixes (graph.go:31)."""
    global _table_suffix, _loop_suffix
    _table_suffix = _DEFAULT_TABLE_SUFFIX
    _loop_suffix = _DEFAULT_LOOP_SUFFIX


def group_table(group: str) -> str:
    """goka GroupTable (graph.go:472): the table-topic name of a
    group under the current suffix."""
    return f"{group}{_table_suffix}"


def loop_stream(group: str) -> str:
    """goka loopName (graph.go:481): the loop-topic name of a group
    under the current suffix."""
    return f"{group}{_loop_suffix}"


@dataclass
class Edge:
    """Base edge; ``topic`` names a stream or table dataset."""

    topic: str
    codec: Optional[Codec] = None


@dataclass
class InputStream(Edge):
    """goka.Input (graph.go:304-318): consume a stream.

    ``key`` extracts the group key (goka: the Kafka message key),
    ``ts`` the event-time column, ``where``/``select`` the declarative
    part of the process callback.
    """

    key: Optional[ColumnLike] = None
    ts: str = "ts"
    where: Optional[ColumnLike] = None
    select: Optional[Transform] = None
    # False ⇒ this input's callback never calls SetValue (it only
    # Emits/Loopbacks), so its rows don't feed the group-table fold —
    # e.g. the detector in examples/3-messaging re-keys via Loopback.
    contributes: bool = True
    # goka WithNilHandling (options.go:314): "ignore" drops messages
    # whose value column is NULL before the callback (NilIgnore);
    # "process" (default) passes them through (NilProcess/NilDecode —
    # tombstones reach the fold, matching goka's default decode path).
    nil_handling: str = "process"
    nil_col: str = "value"


@dataclass
class PersistEdge(Edge):
    """goka.Persist (graph.go:394-403): the group table.

    ``update`` is goka's WithUpdateCallback (options.go:173): a hook
    applied to the folded table before it is exposed/persisted —
    validate, transform, or redact state on its way to storage."""

    fold: Any = None  # folds.Fold; typed loosely to avoid import cycle
    update: Optional[Transform] = None


@dataclass
class OutputEdge(Edge):
    """goka.Output (graph.go:350-358): ctx.Emit target."""

    transform: Optional[Transform] = None
    key: Optional[ColumnLike] = None


@dataclass
class JoinEdge(Edge):
    """goka.Join (graph.go:360-373): co-partitioned table join.

    The joined table must be keyed by the same group key (goka
    enforces copartitioning — copartition_strategy.go); we join on
    ``on`` (default: the group key).
    """

    on: Optional[ColumnLike] = None
    how: str = "left"


@dataclass
class LookupEdge(Edge):
    """goka.Lookup (graph.go:375-386): foreign-keyed table access.

    Goka materializes the whole foreign table on every instance; the
    Spark-native equivalent is a broadcast join.
    """

    on: Optional[ColumnLike] = None
    table_key: str = "key"
    how: str = "left"


@dataclass
class LoopEdge(Edge):
    """goka.Loop (graph.go:388-392): ctx.Loopback re-keying.

    ``rekey`` maps the enriched input stream to a new stream whose
    ``key`` column replaces the group key; the loop stream is folded
    into the group table alongside direct inputs (optionally after
    ``select``).
    """

    rekey: Optional[Transform] = None


@dataclass
class VisitorEdge(Edge):
    """goka.Visit (processor.go VisitAllWithStats): apply a projection
    over every key of the group table."""

    name: str = "visitor"
    transform: Optional[Transform] = None


def input_stream(
    topic: str,
    codec: Optional[Codec] = None,
    *,
    key: Optional[ColumnLike] = None,
    ts: str = "ts",
    where: Optional[ColumnLike] = None,
    select: Optional[Transform] = None,
    contributes: bool = True,
    nil_handling: str = "process",
    nil_col: str = "value",
) -> InputStream:
    if nil_handling not in ("process", "ignore"):
        raise ValueError(f"nil_handling must be process|ignore, got {nil_handling!r}")
    return InputStream(topic=topic, codec=codec, key=key, ts=ts, where=where,
                       select=select, contributes=contributes,
                       nil_handling=nil_handling, nil_col=nil_col)


def inputs(topics: list[str], codec: Optional[Codec] = None, **kw: Any) -> list[InputStream]:
    """goka.Inputs (graph.go:320-348): same callback on many topics."""
    return [input_stream(t, codec, **kw) for t in topics]


def persist(fold: Any, codec: Optional[Codec] = None,
            update: Optional[Transform] = None) -> PersistEdge:
    return PersistEdge(topic="", codec=codec, fold=fold, update=update)


def output(
    topic: str,
    codec: Optional[Codec] = None,
    *,
    transform: Optional[Transform] = None,
    key: Optional[ColumnLike] = None,
) -> OutputEdge:
    return OutputEdge(topic=topic, codec=codec, transform=transform, key=key)


def join(topic: str, codec: Optional[Codec] = None, *, on: Optional[ColumnLike] = None,
         how: str = "left") -> JoinEdge:
    return JoinEdge(topic=topic, codec=codec, on=on, how=how)


def lookup(topic: str, codec: Optional[Codec] = None, *, on: Optional[ColumnLike] = None,
           table_key: str = "key", how: str = "left") -> LookupEdge:
    return LookupEdge(topic=topic, codec=codec, on=on, table_key=table_key, how=how)


def loop(rekey: Transform, codec: Optional[Codec] = None) -> LoopEdge:
    return LoopEdge(topic="", codec=codec, rekey=rekey)


def visitor(name: str, transform: Transform) -> VisitorEdge:
    return VisitorEdge(topic="", name=name, transform=transform)


@dataclass
class GroupGraph:
    """Validated processor-group graph (goka GroupGraph, graph.go:55)."""

    group: str
    input_edges: list[InputStream] = field(default_factory=list)
    persist_edge: Optional[PersistEdge] = None
    output_edges: list[OutputEdge] = field(default_factory=list)
    join_edges: list[JoinEdge] = field(default_factory=list)
    lookup_edges: list[LookupEdge] = field(default_factory=list)
    loop_edge: Optional[LoopEdge] = None
    visitor_edges: list[VisitorEdge] = field(default_factory=list)

    #: topic names stamped by define_group under the suffixes current
    #: at definition time (like goka, where DefineGroup evaluates
    #: tableName/loopName then; a later SetTableSuffix does not rename
    #: an already-defined graph's topics)
    _table_topic: Optional[str] = None
    _loop_topic: Optional[str] = None

    @property
    def group_table(self) -> str:
        """Table-topic name, goka's ``<group><table-suffix>``
        (graph.go:472 GroupTable, :476 tableName)."""
        return self._table_topic or group_table(self.group)

    @property
    def loop_stream(self) -> str:
        return self._loop_topic or loop_stream(self.group)


def define_group(group: str, *edges: Any) -> GroupGraph:
    """Build + validate a GroupGraph (goka DefineGroup, graph.go:128-215)."""
    g = GroupGraph(group=group)
    g._table_topic = group_table(group)
    g._loop_topic = loop_stream(group)
    flat: list[Any] = []
    for e in edges:
        flat.extend(e if isinstance(e, list) else [e])
    for e in flat:
        if isinstance(e, InputStream):
            g.input_edges.append(e)
        elif isinstance(e, PersistEdge):
            if g.persist_edge is not None:
                raise ValueError("only one Persist edge allowed")
            e.topic = g._table_topic
            g.persist_edge = e
        elif isinstance(e, OutputEdge):
            g.output_edges.append(e)
        elif isinstance(e, JoinEdge):
            g.join_edges.append(e)
        elif isinstance(e, LookupEdge):
            g.lookup_edges.append(e)
        elif isinstance(e, LoopEdge):
            if g.loop_edge is not None:
                raise ValueError("only one Loop edge allowed")
            e.topic = g._loop_topic
            g.loop_edge = e
        elif isinstance(e, VisitorEdge):
            g.visitor_edges.append(e)
        else:
            raise TypeError(f"unknown edge type: {type(e)!r}")
    if not g.input_edges:
        raise ValueError("at least one input stream required (graph.go:141)")
    return g
