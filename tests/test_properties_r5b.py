"""Property tests for the late-round-5 operators: random corpora,
independent pure-Python references.

- ngram_containment_pairs (max_df=None): exact containment in both
  directions against a brute-force shingle-set reference.
- corpus_weighted_sample machinery (C.weighted_sample): the selected
  id set equals the pure-Python Efraimidis-Spirakis draw from the
  same md5-derived uniforms.
- decontaminate_spans: spans are exactly the gaps-and-islands merge
  of the contaminated positions' word intervals (word coverage — the
  r4 lesson: never invert spans back to gram starts).
"""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from goka_spark.functions import corpus as C
from goka_spark.functions import dedup as D

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=10)


@pytest.fixture(scope="module")
def _spark():
    from goka_spark.session import get_session

    return get_session("props_r5b")


def _docs(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string")


def _shingles(ws, n):
    if not ws:
        return []
    if len(ws) < n:
        return [" ".join(ws)]
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


@given(corpus=corpus_strategy)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_containment_matches_bruteforce(corpus, _spark):
    spark = _spark
    got = {(r.id_a, r.id_b): (r.cont_a, r.cont_b)
           for r in D.ngram_containment_pairs(
               _docs(spark, corpus), "doc_id", "text", n=3,
               threshold=0.0, max_df=None).collect()}
    sets = {i: set(_shingles(ws, 3)) for i, ws in enumerate(corpus)}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            shared = len(sets[a] & sets[b])
            if shared:
                want[(a, b)] = (round(shared / len(sets[a]), 4),
                                round(shared / len(sets[b]), 4))
    assert got == want


@given(corpus=corpus_strategy, k=st.integers(min_value=1, max_value=8),
       salt=st.sampled_from(["s1", "s2"]))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_sample_matches_reference(corpus, k, salt, _spark):
    spark = _spark
    df = spark.createDataFrame(
        [(i, len(ws) + 1) for i, ws in enumerate(corpus)],
        "doc_id long, w long")
    got = [(r.doc_id, r.weight) for r in
           C.weighted_sample(df, "doc_id", "w", k, salt=salt)
           .orderBy(F.col("sample_key").desc(), "doc_id").collect()]

    def key(i, w):
        slot = int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8],
                   16) % (1 << 32)
        return math.log((slot + 1) / float(1 << 32)) / w

    ranked = sorted(((i, len(ws) + 1) for i, ws in enumerate(corpus)),
                    key=lambda t: (-key(*t), t[0]))
    assert got == ranked[:k]


@given(corpus=corpus_strategy)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_decontaminate_spans_are_merged_islands(corpus, _spark):
    """Spans must equal the gaps-and-islands merge of the contaminated
    positions' intervals [p, p+n-1] — compared as merged intervals,
    never inverted back to gram starts (the r4 test-bug lesson)."""
    spark = _spark
    n = 2
    bench_ws = [ws for i, ws in enumerate(corpus) if i % 2 == 0]
    corp = [(i, ws) for i, ws in enumerate(corpus) if i % 2 == 1]
    bench_set = set().union(*[set(_shingles(ws, n)) for ws in bench_ws]) \
        if bench_ws else set()
    bench_df = spark.createDataFrame(
        [(1000 + j, " ".join(ws)) for j, ws in enumerate(bench_ws)] or
        [(1000, "")], "doc_id long, text string")
    corp_df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in corp] or [(0, "")],
        "doc_id long, text string")
    got = {}
    for r in D.decontaminate_spans(corp_df, bench_df, "doc_id", "text",
                                   n=n).collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.bench_grams))
    want = {}
    for i, ws in corp:
        hits = [p + 1 for p, sh in enumerate(_shingles(ws, n))
                if sh in bench_set]
        spans = []
        for p in hits:  # positions ascending
            if spans and p <= spans[-1][1] + 1:
                s, e, g = spans[-1]
                spans[-1] = (s, max(e, p + n - 1), g + 1)
            else:
                spans.append((p, p + n - 1, 1))
        if spans:
            want[i] = spans
    got = {d: sorted(v) for d, v in got.items()}
    assert got == want
