"""Property tests for the round-5 operators: random corpora,
pure-Python reference models, derandomized hypothesis.

- word_entropy: micro-nat integers and the closing double match a
  Python reference bit-for-bit; entropy bounds hold.
- blocklist_hits: counts and the integer boundary verdict match a
  Python reference exactly.
- common_ngrams: equals the Python Counter top-k under the same
  total order (df DESC, gram ASC).
- cluster_balanced_sample: policy invariants — whole clusters kept
  under the cap, membership a pure function of (signs, id), rates
  match the integer formula.
"""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from goka_spark.functions import dedup as D
from goka_spark.functions import similarity as S
from goka_spark.functions import text as T

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=12)


@pytest.fixture(scope="module")
def _spark():
    from goka_spark.session import get_session

    return get_session("props_r5")


def _docs(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string")


# --------------------------------------------------------- entropy

@given(corpus=corpus_strategy)
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_word_entropy_matches_reference(corpus, _spark):
    got = {r["doc_id"]: r for r in
           T.word_entropy(_docs(_spark, corpus), "doc_id", "text").collect()}
    for i, ws in enumerate(corpus):
        n = len(ws)
        row = got[i]
        assert row["n_tokens"] == n
        assert row["n_distinct"] == len(set(ws))
        if n == 0:
            assert row["entropy"] is None
            continue
        clnc = sum(
            math.floor(1e6 * ws.count(w) * math.log(ws.count(w)) + 0.5)
            for w in set(ws))
        # the closing expression replays on exact integers; JVM ln may
        # differ from libm by 1 ulp, hence approx (the driver hash
        # rounds to 6 decimals, far coarser)
        assert row["entropy"] == pytest.approx(
            math.log(n) - clnc / 1e6 / n, abs=1e-12)
        assert -1e-6 <= row["entropy"] <= math.log(len(set(ws))) + 1e-6


# ------------------------------------------------------- blocklist

@given(corpus=corpus_strategy,
       terms=st.lists(st.sampled_from(WORDS), min_size=1, max_size=3,
                      unique=True),
       ratio_e6=st.sampled_from([0, 50_000, 250_000, 1_000_000]))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_blocklist_matches_reference(corpus, terms, ratio_e6, _spark):
    out = {r["doc_id"]: r for r in
           T.blocklist_hits(_docs(_spark, corpus), "doc_id", "text",
                            terms, max_ratio_e6=ratio_e6).collect()}
    for i, ws in enumerate(corpus):
        hits = sum(1 for w in ws if w in terms)
        row = out[i]
        assert row["n_words"] == len(ws)
        assert row["hits_total"] == hits
        assert row["hits_distinct"] == len({w for w in ws if w in terms})
        assert row["keep"] == (hits * 1_000_000 <= ratio_e6 * len(ws))


# ---------------------------------------------------- common_ngrams

@given(corpus=corpus_strategy, k=st.integers(min_value=1, max_value=6))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_common_ngrams_matches_reference(corpus, k, _spark):
    from collections import Counter

    def shingles(ws, n=3):
        if not ws:
            return []
        if len(ws) < n:
            return [" ".join(ws)]
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    df_counts = Counter()
    for ws in corpus:
        for sh in set(shingles(ws)):
            df_counts[sh] += 1
    want = sorted(((sh, c) for sh, c in df_counts.items() if c >= 2),
                  key=lambda x: (-x[1], x[0]))[:k]
    got = [(r["ngram"], r["df"]) for r in
           D.common_ngrams(_docs(_spark, corpus), "doc_id", "text",
                           n=3, k=k, min_df=2)
           .orderBy(F.desc("df"), "ngram").collect()]
    assert got == want


# ------------------------------------------- cluster-balanced sample

def _slot(vid: int, salt: str = "cbs-v1") -> int:
    h = hashlib.md5(f"{vid}{salt}".encode()).hexdigest()[:8]
    return int(h, 16) % 1_000_000


@given(vecs=st.lists(
    st.lists(st.floats(min_value=-1, max_value=1, allow_nan=False,
                       width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=40), cap=st.integers(min_value=1, max_value=5))
@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cluster_sample_matches_reference(vecs, cap, _spark):
    df = _spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           S.cluster_balanced_sample(df, "vec_id", "embedding",
                                     per_cluster=cap, bits=2).collect()}
    # python reference: same sign-bit cluster, same integer rate policy
    import numpy as np
    clusters = {}
    for i, v in enumerate(vecs):
        v32 = np.array(v, dtype=np.float32)
        c = sum(1 << b for b in range(2) if float(v32[b]) > 0)
        clusters.setdefault(c, []).append(i)
    for c, members in clusters.items():
        n = len(members)
        rate = 1_000_000 if n <= cap else (cap * 1_000_000) // n
        for i in members:
            row = out[i]
            assert row["cluster"] == c
            assert row["n_cluster"] == n
            assert row["keep"] == (_slot(i) < rate)
