"""Message headers as a first-class ``map<string,binary>`` column.

goka models headers as ``Headers map[string][]byte`` (headers.go:8)
carried on every message (EmitWithHeaders, emitter.go:60; ctx.Headers
context.go).  Spark-first, headers are a ``map<string,binary>`` column
named ``headers`` that rides the topic schema end-to-end: the emitter
writes it, processors read it with plain map accessors (JVM codegen,
no JSON parsing on the hot path), and folds/outputs see it like any
other column.

The JSON ``props`` side-channel used by some synthetic inputs remains
a *second* accepted shape — ``from_props`` lifts it into a real
headers map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEADERS = "headers"


def make_headers(**entries: Column) -> Column:
    """Build a ``map<string,binary>`` headers column.  String/other
    values are cast to string and UTF-8 encoded (goka header values
    are raw bytes; the string codec is the common case)."""
    pairs: list[Column] = []
    for name, col in entries.items():
        pairs.append(F.lit(name))
        pairs.append(F.encode(col.cast("string"), "UTF-8"))
    return F.create_map(*pairs)


def from_props(props: Column, *keys: str) -> Column:
    """Lift a JSON props side-channel into a headers map (the
    compatibility shape for topics without native headers)."""
    return make_headers(**{
        k: F.get_json_object(props, f"$.{k}") for k in keys})


def header(name: str, headers: Column | str = HEADERS) -> Column:
    """Raw header bytes (ctx.Headers()[name]) — NULL when absent."""
    col = F.col(headers) if isinstance(headers, str) else headers
    return F.element_at(col, name)


def header_string(name: str, headers: Column | str = HEADERS) -> Column:
    return F.decode(header(name, headers), "UTF-8")


def header_long(name: str, headers: Column | str = HEADERS) -> Column:
    return header_string(name, headers).cast("long")


def merge_headers(*cols: Column | str) -> Column:
    """goka ``Headers.Merged`` (headers.go:22) as a column expression:
    merge any number of ``map<string,binary>`` header columns, LATER
    keys overriding earlier ones; NULL/empty inputs are tolerated and
    an all-empty merge yields NULL (so the result can feed an emit
    directly, like the reference's nil return).

    Header maps are tiny (a handful of keys), so the per-row
    later-wins dedup below is O(k²) on k headers — negligible, and it
    keeps the whole merge inside JVM codegen (no UDF)."""
    entries = F.concat(*[
        F.coalesce(
            F.map_entries(F.col(c) if isinstance(c, str) else c),
            F.array().cast("array<struct<key:string,value:binary>>"))
        for c in cols])
    rev = F.reverse(entries)            # later-wins ⇒ keep FIRST in rev
    deduped = F.filter(
        rev, lambda e, i: ~F.exists(
            F.slice(rev, F.lit(1), i),
            lambda p: p["key"] == e["key"]))
    return F.when(F.size(deduped) > 0,
                  F.map_from_entries(F.reverse(deduped)))
