"""Property tests for the round-4 operators: random corpora, invariants
that must hold structurally (not just on the synthetic test tables).

- auto_max_df: the selected cutoff always satisfies the work budget
  and is maximal (matches an independent Python reference).
- dup_span_extract: spans are disjoint, in-bounds, and cover exactly
  the duplicated positions (reference recomputed in Python).
- dsir_importance: equals a pure-Python reference model bit-for-bit
  on the micro-nat integers (bucket hashing, Laplace smoothing, and
  per-doc integer sums all reproduced independently).
"""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from goka_spark.functions import dedup as D
from goka_spark.functions import text as T

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=12)


@pytest.fixture(scope="module")
def _spark():
    from goka_spark.session import get_session

    return get_session("props_r4")


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


@given(corpus=corpus_strategy, budget=st.integers(min_value=1, max_value=64))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_auto_max_df_budget_and_maximality(corpus, budget, _spark):
    spark = _spark
    docs = _docs(spark, corpus)
    sh = (D.shingle_postings(docs, "doc_id", "text", 3, distinct=False)
          .repartition("sh").dropDuplicates(["doc", "sh"]))
    got = D.auto_max_df(sh, budget=budget)

    # independent reference from the raw corpus
    postings = set()
    for i, ws in enumerate(corpus):
        for s in set(_shingles(ws, 3)):
            postings.add((i, s))
    from collections import Counter
    dfs = Counter(s for _, s in postings)
    total = len(postings)
    hist = Counter(dfs.values())
    cum, ref = 0, 1
    for d in sorted(hist):
        cum += d * d * hist[d]
        if cum > budget * total:
            break
        ref = d
    assert got == ref


@given(corpus=corpus_strategy)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dup_span_invariants(corpus, _spark):
    spark = _spark
    n = 3
    docs = _docs(spark, corpus)
    rows = D.dup_span_extract(docs, "doc_id", "text",
                              n=n, min_df=2).collect()

    # reference: duplicated positions per doc
    from collections import Counter, defaultdict
    doc_sh = {i: _shingles(ws, n) for i, ws in enumerate(corpus)}
    dfs = Counter()
    for i, shs in doc_sh.items():
        for s in set(shs):
            dfs[s] += 1
    dup_pos = defaultdict(set)
    for i, shs in doc_sh.items():
        for p, s in enumerate(shs, start=1):
            if dfs[s] >= 2:
                dup_pos[i].add(p)

    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for i, spans in by_doc.items():
        spans = sorted(spans, key=lambda r: r.span_start)
        # disjoint, non-adjacent (else they would have merged), in-bounds
        for a, b in zip(spans, spans[1:]):
            assert a.span_end + 1 < b.span_start
        # Spans are the gaps-and-islands merge of word intervals
        # [p, p+n-1] over duplicated gram starts.  Compare WORD
        # coverage — a span->gram-start inversion is not sound: a
        # merged span may contain interior positions whose own gram
        # has df < min_df (e.g. dup starts {1,3} with n=3 merge to
        # [1,5], which covers non-dup start 2).
        covered = set()
        for r in spans:
            assert 1 <= r.span_start <= r.span_end
            covered.update(range(r.span_start, r.span_end + 1))
        want_cover = set()
        for p in dup_pos[i]:
            want_cover.update(range(p, p + n))
        assert covered == want_cover
        # dup_grams per span sum to the doc's duplicated positions
        assert sum(r.dup_grams for r in spans) == len(dup_pos[i])
    assert set(by_doc) == {i for i in dup_pos if dup_pos[i]}


def _md5_bucket(s, k):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % k


@given(corpus=corpus_strategy)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dsir_matches_python_reference(corpus, _spark):
    spark = _spark
    k = 64
    docs = _docs(spark, corpus)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    rows = T.dsir_importance(docs, target, "doc_id", "text",
                             n_buckets=k).collect()

    # pure-Python reference model
    from collections import Counter

    def grams(ws):
        return list(ws) + _shingles(ws, 2) if ws else []

    feats = {i: Counter(_md5_bucket(g, k) for g in grams(ws))
             for i, ws in enumerate(corpus) if grams(ws)}
    cr, ct = Counter(), Counter()
    for i, c in feats.items():
        cr.update(c)
        if i % 2 == 0:
            ct.update(c)
    r_tot, t_tot = sum(cr.values()), sum(ct.values())
    lr = {b: math.floor(
        1e6 * (math.log((ct.get(b, 0) + 1) / (t_tot + k))
               - math.log((cr[b] + 1) / (r_tot + k))) + 0.5)
        for b in cr}
    want = {i: sum(cnt * lr[b] for b, cnt in c.items())
            for i, c in feats.items()}
    got = {r.doc_id: r.weight_e6 for r in rows}
    assert got == want


@given(corpus=corpus_strategy)
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_lm_logprob_matches_python_reference(corpus, _spark):
    spark = _spark
    docs = _docs(spark, corpus)
    rows = {r.doc_id: r for r in
            T.lm_logprob(docs, "doc_id", "text").collect()}

    from collections import Counter
    pairs = {i: list(zip(ws, ws[1:])) for i, ws in enumerate(corpus)}
    cpw, cp = Counter(), Counter()
    vocab = set()
    for i, ws in enumerate(corpus):
        vocab.update(ws)
        for p in pairs[i]:
            cpw[p] += 1
            cp[p[0]] += 1
    v = len(vocab)
    lp = {p: math.floor(1e6 * math.log((c + 1) / (cp[p[0]] + v)) + 0.5)
          for p, c in cpw.items()}
    for i, ws in enumerate(corpus):
        want_n = len(pairs[i])
        want_sum = sum(lp[p] for p in pairs[i])
        assert rows[i].n_bigrams == want_n
        assert rows[i].logprob_e6 == (want_sum if want_n else 0)
        if want_n:
            assert rows[i].avg_logprob == want_sum / 1e6 / want_n
        else:
            assert rows[i].avg_logprob is None


@given(corpus=corpus_strategy, min_df=st.integers(min_value=2, max_value=3))
@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_matches_python_reference(corpus, min_df, _spark):
    spark = _spark
    # treat each 2-word window as a line to get multi-line docs
    def lines_of(ws):
        return [" ".join(ws[i:i + 2]) for i in range(0, len(ws), 2)] or [""]

    docs = spark.createDataFrame(
        [(i, "\n".join(lines_of(ws))) for i, ws in enumerate(corpus)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in T.line_dedup_filter(
        docs, "doc_id", "text", min_df=min_df).collect()}

    from collections import Counter
    doc_lines = {i: lines_of(ws) for i, ws in enumerate(corpus)}
    dfs = Counter()
    for i, ls in doc_lines.items():
        for ln in set(ls):
            if ln:
                dfs[ln] += 1
    for i, ls in doc_lines.items():
        kept = [ln for ln in ls if ln == "" or dfs[ln] < min_df]
        assert rows[i].clean_text == "\n".join(kept)
        assert rows[i].lines_total == len(ls)
        assert rows[i].lines_removed == len(ls) - len(kept)
